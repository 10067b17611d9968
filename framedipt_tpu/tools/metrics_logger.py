"""Training metrics logging: JSONL file + optional neptune passthrough.

Role of the reference's Neptune integration (config-only in the public code,
config/base.yaml:87; the neptune pip dep carries no surviving calls). Here:
a dependency-free JSONL metrics stream any dashboard can tail, with a
neptune adapter that activates only if the package + credentials exist.
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Any

from framedipt_tpu.tools.log import get_logger

logger = get_logger()


class MetricsLogger:
    def __init__(self, run_dir: str | pathlib.Path, use_neptune: bool = False):
        self.path = pathlib.Path(run_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", encoding="utf-8")
        self._neptune = None
        if use_neptune:
            try:  # pragma: no cover - external service
                import neptune  # type: ignore

                self._neptune = neptune.init_run()
            except Exception as e:  # noqa: BLE001
                logger.warning(f"neptune disabled: {e}")

    def log(self, step: int, metrics: dict[str, Any]) -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._neptune is not None:  # pragma: no cover
            for k, v in row.items():
                if k not in ("step", "time"):
                    self._neptune[f"train/{k}"].append(v, step=step)

    def close(self) -> None:
        self._fh.close()
        if self._neptune is not None:  # pragma: no cover
            self._neptune.stop()

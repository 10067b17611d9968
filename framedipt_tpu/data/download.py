"""RCSB structure download utilities.

Role of framedipt/data/utils.py:99-149 (assembly-1 mmCIF downloads with a
thread pool). Gated: in zero-egress environments the functions raise with a
clear message instead of hanging.
"""
from __future__ import annotations

import concurrent.futures
import pathlib
import urllib.error
import urllib.request

from framedipt_tpu.tools.log import get_logger

logger = get_logger()

RCSB_URL = "https://files.rcsb.org/download"


def download_cif(
    pdb_id: str,
    out_dir: str | pathlib.Path,
    first_assembly: bool = True,
    timeout: float = 30.0,
) -> pathlib.Path:
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = f"{pdb_id.lower()}-assembly1.cif" if first_assembly else f"{pdb_id.lower()}.cif"
    target = out_dir / name
    if target.exists():
        return target
    url = f"{RCSB_URL}/{name}"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            target.write_bytes(resp.read())
    except (urllib.error.URLError, OSError) as e:
        raise ConnectionError(
            f"failed to download {url} (offline environment?): {e}"
        ) from e
    return target


def download_cifs(
    pdb_ids: list[str],
    out_dir: str | pathlib.Path,
    first_assembly: bool = True,
    max_workers: int = 8,
) -> list[pathlib.Path]:
    """Thread-pool download; failures are logged and skipped."""
    results: list[pathlib.Path] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {
            pool.submit(download_cif, pid, out_dir, first_assembly): pid
            for pid in pdb_ids
        }
        for fut in concurrent.futures.as_completed(futures):
            pid = futures[fut]
            try:
                results.append(fut.result())
            except ConnectionError as e:
                logger.warning(f"{pid}: {e}")
    return results

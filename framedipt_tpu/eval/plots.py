"""Shared plotting helpers (role of evaluation/utils/plot.py:13-340)."""
from __future__ import annotations

import pathlib

import numpy as np
import pandas as pd

from framedipt_tpu.tools.log import get_logger

logger = get_logger()


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    return plt, sns


def box_swarm_plot(
    df: pd.DataFrame,
    x: str,
    y: str,
    out_path: pathlib.Path,
    title: str | None = None,
) -> pathlib.Path | None:
    try:
        plt, sns = _mpl()
    except ImportError:  # pragma: no cover
        logger.warning("matplotlib unavailable; skipping plot")
        return None
    fig, ax = plt.subplots(figsize=(max(6, 0.5 * df[x].nunique()), 4))
    sns.boxplot(data=df, x=x, y=y, ax=ax, color="lightblue")
    sns.swarmplot(data=df, x=x, y=y, ax=ax, color="black", size=3)
    ax.tick_params(axis="x", rotation=90)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def pearson_scatter(
    df: pd.DataFrame,
    x: str,
    y: str,
    out_path: pathlib.Path,
) -> tuple[pathlib.Path | None, float]:
    """Scatter with Pearson r annotation (plot.py's correlation plots)."""
    sub = df[[x, y]].dropna()
    if len(sub) < 2:
        return None, float("nan")
    r = float(np.corrcoef(sub[x], sub[y])[0, 1])
    try:
        plt, sns = _mpl()
    except ImportError:  # pragma: no cover
        return None, r
    fig, ax = plt.subplots(figsize=(5, 5))
    sns.regplot(data=sub, x=x, y=y, ax=ax, scatter_kws={"s": 12})
    ax.set_title(f"pearson r = {r:.3f} (n={len(sub)})")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path, r


def per_position_line_plot(
    values_by_name: dict[str, np.ndarray],
    out_path: pathlib.Path,
    ylabel: str = "RMSD (A)",
) -> pathlib.Path | None:
    """Per-residue-position metric lines (the reference's 1-4,5,-4..-1
    middle-averaged position plots, evaluation/utils/metrics.py:728)."""
    try:
        plt, _ = _mpl()
    except ImportError:  # pragma: no cover
        return None
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, vals in values_by_name.items():
        ax.plot(np.arange(1, len(vals) + 1), vals, marker="o", label=name)
    ax.set_xlabel("position in diffused region")
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def middle_average(values: np.ndarray, keep_each_side: int = 4) -> np.ndarray:
    """Collapse variable-length regions to fixed positions: first/last
    ``keep_each_side`` residues kept, middle averaged into one slot
    (the reference's XTICKS 1-4, 5(=middle), -4..-1 scheme,
    evaluation/utils/constants.py + metrics.py:728)."""
    k = keep_each_side
    if len(values) <= 2 * k:
        return np.asarray(values)
    middle = np.mean(values[k:-k])
    return np.concatenate([values[:k], [middle], values[-k:]])

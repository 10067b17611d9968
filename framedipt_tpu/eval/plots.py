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


# xticks of the per-residue grouped plots: left 4, averaged middle ("5"),
# right 4 (evaluation/utils/constants.py:30).
XTICKS = [str(idx) for idx in (1, 2, 3, 4, 5, -4, -3, -2, -1)]


def _median_mad(metric_groups: list[np.ndarray]) -> tuple[float, float]:
    flat = np.concatenate([np.asarray(g, dtype=float) for g in metric_groups])
    flat = flat[np.isfinite(flat)]
    if not len(flat):
        return float("nan"), float("nan")
    med = float(np.median(flat))
    mad = float(np.median(np.abs(flat - med)))
    return med, mad


def grouped_alpha_beta_plot(
    metrics_alpha: list[np.ndarray],
    metrics_beta: list[np.ndarray],
    eval_output_path: pathlib.Path,
    legend: str,
    xticks: list[str],
    swarm: bool = False,
    superpose_box: bool = False,
) -> pathlib.Path | None:
    """The reference's grouped alpha/beta layouts: side-by-side boxplots
    (evaluation/utils/plot.py:87-155 ``boxplot_metrics_alpha_beta``) or a
    dodged seaborn swarm with optional superposed boxes (``:205-280
    swarmplot_metrics_alpha_beta``). Title carries per-chain
    median ± median-abs-deviation; file naming matches the reference
    (``{legend}_median_boxplot.png`` / ``_median_swarmplot.png``)."""
    xs_len = max(len(metrics_alpha), len(metrics_beta))
    if len(xticks) != xs_len:
        raise ValueError(
            f"xticks length must match chain metric count, "
            f"got {len(xticks)} != {xs_len}."
        )
    try:
        plt, sns = _mpl()
    except ImportError:  # pragma: no cover
        logger.warning("matplotlib unavailable; skipping plot")
        return None

    fig, ax = plt.subplots(figsize=(8, 6))
    xs = np.arange(xs_len) + 1
    if swarm:
        rows = []
        for xtick, vals in zip(xticks, metrics_alpha):
            rows += [
                {"Residue index": xtick, "Chain": "alpha", legend: float(v)}
                for v in vals
            ]
        for xtick, vals in zip(xticks, metrics_beta):
            rows += [
                {"Residue index": xtick, "Chain": "beta", legend: float(v)}
                for v in vals
            ]
        sns.swarmplot(
            data=pd.DataFrame(rows), x="Residue index", y=legend,
            hue="Chain", dodge=True, ax=ax, size=3,
        )
        if superpose_box:
            ax.boxplot(
                metrics_alpha, showfliers=False, widths=0.2,
                positions=np.arange(len(metrics_alpha)) - 0.2,
            )
            ax.boxplot(
                metrics_beta, showfliers=False, widths=0.2,
                positions=np.arange(len(metrics_beta)) + 0.2,
            )
        ax.set_xticks(np.arange(xs_len))
    else:
        box_a = ax.boxplot(
            metrics_alpha, showfliers=False, patch_artist=True, widths=0.3,
            positions=xs[: len(metrics_alpha)] - 0.2,
        )
        box_b = ax.boxplot(
            metrics_beta, showfliers=False, patch_artist=True, widths=0.3,
            positions=xs[: len(metrics_beta)] + 0.2,
        )
        for patch in box_a["boxes"]:
            patch.set_facecolor("royalblue")
        for patch in box_b["boxes"]:
            patch.set_facecolor("orange")
        ax.legend([box_a["boxes"][0], box_b["boxes"][0]], ["alpha", "beta"])
        ax.set_xticks(xs)
    ax.set_xticklabels(xticks)
    med_a, mad_a = _median_mad(metrics_alpha)
    med_b, mad_b = _median_mad(metrics_beta)
    ax.set_title(
        f"{legend}\n"
        f"alpha Median {med_a:.2f}$\\pm${mad_a:.2f}\n"
        f"beta Median {med_b:.2f}$\\pm${mad_b:.2f}",
        fontsize=14,
    )
    fig.tight_layout()
    kind = "swarmplot" if swarm else "boxplot"
    out = (
        pathlib.Path(eval_output_path)
        / f"{legend.lower().replace(' ', '_')}_median_{kind}.png"
    )
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def median_sample_rows(
    df: pd.DataFrame, metric: str = "bb_rmsd"
) -> pd.DataFrame:
    """One representative row per pdb_name: the sample whose ``metric`` is
    closest to that pdb's median (ties -> first).

    The reference selects via pd.merge on the exact median value
    (evaluate_tcr.py:587-590), identical for its odd 5-sample protocol but
    silently dropping every pdb with an EVEN sample count (the median is
    the mean of two middle values and matches no row). Closest-to-median
    keeps one row per pdb for any count.
    """
    df = df.reset_index(drop=True)  # unique labels for idxmin -> loc
    idx = df.groupby("pdb_name")[metric].transform("median")
    order = (df[metric] - idx).abs()
    return df.loc[
        order.groupby(df["pdb_name"]).idxmin().to_numpy()
    ].reset_index(drop=True)


def two_models_scatter_plot(
    df_metrics: pd.DataFrame,
    df_esmfold_metrics: pd.DataFrame,
    eval_output_path: pathlib.Path,
    choice: str = "median",
) -> pathlib.Path | None:
    """Per-chain backbone-RMSD scatter of this model vs ESMFold/AlphaFold
    with the y=x diagonal (evaluation/utils/plot.py:281-339). ``choice``
    picks the median or best sample per pdb_name before scattering; the
    two frames are joined on pdb_name (the reference pairs rows
    positionally, which mislabels points whenever the two CSVs differ in
    order or row count)."""
    if choice == "median":
        df_analyse = median_sample_rows(df_metrics)
    elif choice == "best":
        df_best = df_metrics.reset_index(drop=True)  # unique labels for loc
        df_analyse = df_best.loc[
            df_best.groupby("pdb_name")["bb_rmsd"].idxmin().to_numpy()
        ]
    else:
        raise ValueError(f"Choice need to be median or best, got {choice}.")
    df_analyse = pd.merge(
        df_analyse,
        df_esmfold_metrics[["pdb_name", "bb_rmsd_alpha", "bb_rmsd_beta"]],
        how="inner",
        on="pdb_name",
        suffixes=("", "_esmfold"),
    )
    try:
        plt, _ = _mpl()
    except ImportError:  # pragma: no cover
        return None
    xs = np.linspace(0, 10, 100)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(xs, xs, color="black", linestyle="dashed")
    ax.scatter(
        df_analyse["bb_rmsd_alpha_esmfold"].to_numpy(),
        df_analyse["bb_rmsd_alpha"].to_numpy(),
        label="alpha",
    )
    ax.scatter(
        df_analyse["bb_rmsd_beta_esmfold"].to_numpy(),
        df_analyse["bb_rmsd_beta"].to_numpy(),
        label="beta",
    )
    ax.set_xlim([0, 10])
    ax.set_xlabel("ESMFold backbone RMSD", fontsize=14)
    ax.set_ylabel("FrameDiPT backbone RMSD", fontsize=14)
    ax.set_title("Backbone RMSD", fontsize=16)
    ax.legend(fontsize=12)
    fig.tight_layout()
    out = pathlib.Path(eval_output_path) / "bb_rmsd_framedipt_esmfold_scatter.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def length_colored_scatter(
    xs: np.ndarray,
    ys: np.ndarray,
    lengths: np.ndarray,
    xlabel: str,
    ylabel: str,
    out_path: pathlib.Path,
) -> pathlib.Path | None:
    """Scatter colored blue→red by sequence length with a colorbar — the
    layout shared by the reference's novelty (scRMSD vs pdbTM,
    eval_denovo.py:630-650) and helix/sheet composition (:653-716) plots."""
    try:
        plt, _ = _mpl()
    except ImportError:  # pragma: no cover
        return None
    import matplotlib.colors as mcolor

    lengths = np.asarray(lengths, dtype=float)
    lo, hi = float(np.min(lengths)), float(np.max(lengths))
    cmap = mcolor.LinearSegmentedColormap.from_list("redblue", ["b", "r"])
    cnorm = mcolor.Normalize(vmin=lo, vmax=hi)
    fig, ax = plt.subplots(figsize=(8, 6))
    denom = (hi - lo) or 1.0
    colors = np.array([cmap((l - lo) / denom) for l in lengths])
    ax.scatter(np.asarray(xs, float), np.asarray(ys, float), c=colors, alpha=0.8)
    fig.colorbar(plt.cm.ScalarMappable(norm=cnorm, cmap=cmap), ax=ax)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return pathlib.Path(out_path)

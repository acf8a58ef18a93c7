"""Publication-grade statistical analysis & plots.

Rebuild of the analysis half of deepwmh/analysis/metrics.py (C12):
- paired boxplot comparison with Wilcoxon / paired-t significance stars
  (reference metrics.py:1000-1204 boxplot_2x)
- lesion-size vs component-Dice scatter with a bootstrap trend band
  (reference metrics.py:304-536)
- nuisance-variable linear regression (reference metrics.py:896-994)
- a blinded visual-scoring harness (reference VisualScoreEvaluation,
  metrics.py:538-893) using CSV score sheets (no xlsx dependency in this
  environment).
"""

from __future__ import annotations

import csv
import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    return plt


def significance_stars(p: float) -> str:
    if p < 0.001:
        return "***"
    if p < 0.01:
        return "**"
    if p < 0.05:
        return "*"
    return "n.s."


def paired_test(a, b, method: str = "wilcoxon") -> float:
    """p-value of a paired two-sided test between matched samples."""
    from scipy import stats

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape
    if method == "wilcoxon":
        if np.allclose(a, b):
            return 1.0
        return float(stats.wilcoxon(a, b).pvalue)
    if method == "ttest":
        return float(stats.ttest_rel(a, b).pvalue)
    raise ValueError(method)


def boxplot_compare(groups, labels, save_file, paired_pairs=None, method="wilcoxon",
                    title="", ylabel=""):
    """Boxplots of metric distributions with significance stars between the
    requested pairs of group indices (reference boxplot_2x)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(1.6 * len(groups) + 2, 5), dpi=120)
    ax.boxplot(groups, showfliers=True)
    ax.set_xticks(range(1, len(labels) + 1), labels)
    top = max(float(np.max(g)) for g in groups if len(g))
    step = 0.08 * max(top, 1e-6)
    y = top + step
    for (i, j) in paired_pairs or []:
        p = paired_test(groups[i], groups[j], method=method)
        ax.plot([i + 1, i + 1, j + 1, j + 1], [y, y + step / 3, y + step / 3, y],
                lw=1, color="k")
        ax.text((i + j) / 2 + 1, y + step / 2, significance_stars(p),
                ha="center", fontsize=10)
        y += step
    ax.set_title(title)
    ax.set_ylabel(ylabel)
    os.makedirs(os.path.dirname(os.path.abspath(save_file)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_file)
    plt.close(fig)


def component_dice_scatter(size_dice_pairs, save_file, n_boot: int = 200,
                           seed: int = 0, title="per-lesion Dice vs size"):
    """Scatter of per-lesion (volume, Dice) with a bootstrap moving-average
    trend band (the reference's LOWESS-bootstrap figure, metrics.py:304-536)."""
    plt = _plt()
    pairs = np.asarray(size_dice_pairs, np.float64)
    if len(pairs) == 0:
        raise ValueError("no components to plot")
    x = np.log10(np.maximum(pairs[:, 0], 1))
    y = pairs[:, 1]
    order = np.argsort(x)
    x, y = x[order], y[order]

    def moving_avg(xs, ys, grid, width):
        out = np.empty_like(grid)
        for k, g in enumerate(grid):
            w = np.exp(-0.5 * ((xs - g) / width) ** 2)
            out[k] = np.sum(w * ys) / max(np.sum(w), 1e-9)
        return out

    grid = np.linspace(x.min(), x.max(), 50)
    width = max((x.max() - x.min()) / 8, 1e-3)
    rng = np.random.RandomState(seed)
    boots = []
    for _ in range(n_boot):
        idx = rng.randint(0, len(x), len(x))
        boots.append(moving_avg(x[idx], y[idx], grid, width))
    boots = np.stack(boots)
    lo, mid, hi = (np.percentile(boots, q, axis=0) for q in (2.5, 50, 97.5))

    fig, ax = plt.subplots(figsize=(7, 5), dpi=120)
    ax.scatter(x, y, s=12, alpha=0.5, color="tab:blue")
    ax.plot(grid, mid, color="tab:red", lw=1.5)
    ax.fill_between(grid, lo, hi, color="tab:red", alpha=0.2)
    ax.set_xlabel("log10 lesion volume (voxels)")
    ax.set_ylabel("per-lesion Dice")
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(save_file)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_file)
    plt.close(fig)


def nuisance_regression(y, covariates):
    """Residualize `y` [N] against nuisance covariates [N, P] with an
    intercept (reference linreg, metrics.py:896-994). Returns (residuals,
    coefficients)."""
    y = np.asarray(y, np.float64)
    X = np.asarray(covariates, np.float64)
    if X.ndim == 1:
        X = X[:, None]
    X1 = np.concatenate([np.ones((len(y), 1)), X], axis=1)
    beta, *_ = np.linalg.lstsq(X1, y, rcond=None)
    resid = y - X1 @ beta
    return resid, beta


class VisualScoreEvaluation:
    """Blinded visual rating harness (reference metrics.py:538-893).

    Build: shuffle (case, method) preview entries with a hidden key, emit a
    rating sheet the rater fills in; Unblind: join scores back to methods.
    Sheets are .xlsx via the in-house core.xlsx codec — matching the
    reference's xlsx rating workflow (metrics.py:584-647) — with CSV as a
    fallback format (fmt="csv").
    """

    def __init__(self, output_folder: str, seed: int = 0, fmt: str = "xlsx"):
        assert fmt in ("xlsx", "csv")
        self.folder = output_folder
        os.makedirs(output_folder, exist_ok=True)
        self.seed = seed
        self.fmt = fmt
        self.entries = []  # (case, method, preview_path)

    def add_entry(self, case: str, method: str, preview_path: str):
        self.entries.append((case, method, preview_path))

    def make_blinded_sheet(self):
        rng = np.random.RandomState(self.seed)
        order = rng.permutation(len(self.entries))
        key_rows = [["blind_id", "case", "method"]]
        sheet_rows = [["blind_id", "preview", "score"]]
        for blind_id, idx in enumerate(order):
            case, method, preview = self.entries[idx]
            key_rows.append([blind_id, case, method])
            sheet_rows.append([blind_id, preview, ""])

        if self.fmt == "xlsx":
            from deepwmh_tpu.core.xlsx import write_xlsx

            key_path = os.path.join(self.folder, "unblind_key.xlsx")
            sheet_path = os.path.join(self.folder, "rating_sheet.xlsx")
            write_xlsx(key_path, {"key": key_rows})
            write_xlsx(sheet_path, {"rating": sheet_rows})
        else:
            key_path = os.path.join(self.folder, "unblind_key.csv")
            sheet_path = os.path.join(self.folder, "rating_sheet.csv")
            with open(key_path, "w", newline="") as kf:
                csv.writer(kf).writerows(key_rows)
            with open(sheet_path, "w", newline="") as sf:
                csv.writer(sf).writerows(sheet_rows)
        return sheet_path, key_path

    @staticmethod
    def _read_rows(path):
        if path.endswith(".xlsx"):
            from deepwmh_tpu.core.xlsx import read_xlsx

            sheets = read_xlsx(path)
            rows = next(iter(sheets.values()))
        else:
            with open(path) as f:
                rows = list(csv.reader(f))
        header = [str(h) for h in rows[0]]
        # pad short rows: an empty trailing cell (unrated score) may be
        # absent from the stored sheet row entirely
        padded = [list(r) + [""] * (len(header) - len(r)) for r in rows[1:]]
        return [dict(zip(header, r)) for r in padded]

    @staticmethod
    def unblind(sheet_path: str, key_path: str) -> dict:
        """Returns {method: [scores]} after the rater filled the sheet."""

        def _id(v):
            return str(int(float(v))) if v not in ("", None) else ""

        key = {
            _id(row["blind_id"]): (row["case"], row["method"])
            for row in VisualScoreEvaluation._read_rows(key_path)
        }
        out = {}
        for row in VisualScoreEvaluation._read_rows(sheet_path):
            score = row.get("score", "")
            if score in ("", None):
                continue
            _case, method = key[_id(row["blind_id"])]
            out.setdefault(method, []).append(float(score))
        return out

"""Human-survey CSV aggregation (+ scatter-plot helper).

Parity: `/root/reference/evaluation/survey/read_csv.py` (per-question
preference counts from a survey CSV) and ``evaluation/paint`` (paper scatter
plots).  CSV contract: one row per respondent, one column per question, cell
values are the chosen option label (e.g. method A/B/C index).
"""
from __future__ import annotations

import csv
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def read_survey_csv(path: str, skip_cols: int = 1) -> List[List[str]]:
    """Rows of answers (first ``skip_cols`` columns dropped: timestamps etc)."""
    with open(path, newline="", encoding="utf-8") as f:
        rows = [row[skip_cols:] for row in csv.reader(f)]
    return [r for r in rows[1:] if any(c.strip() for c in r)]  # drop header


def preference_counts(rows: Sequence[Sequence[str]]) -> List[Counter]:
    """Per-question Counter of chosen options."""
    n_q = max(len(r) for r in rows)
    counts = [Counter() for _ in range(n_q)]
    for row in rows:
        for qi, ans in enumerate(row):
            ans = ans.strip()
            if ans:
                counts[qi][ans] += 1
    return counts


def preference_rates(rows: Sequence[Sequence[str]]) -> Dict[str, float]:
    """Overall fraction of votes per option across all questions."""
    total = Counter()
    for c in preference_counts(rows):
        total.update(c)
    n = sum(total.values())
    return {k: v / n for k, v in sorted(total.items())}


def scatter_plot(xs, ys, labels, out_path: str, xlabel: str = "",
                 ylabel: str = ""):
    """Paper-style labeled scatter (evaluation/paint parity); needs matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("[survey] matplotlib unavailable; skipping plot")
        return None
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(xs, ys)
    for x, y, lab in zip(xs, ys, labels):
        ax.annotate(lab, (x, y), fontsize=8,
                    textcoords="offset points", xytext=(4, 4))
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    fig.savefig(out_path, dpi=160)
    plt.close(fig)
    return out_path

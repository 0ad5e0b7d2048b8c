"""Deterministic test fixtures (FIXTURES.md §2 'messy' frame).

Built with seed=42; every column trips exactly one SURVEY.md §2 check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def messy_pdf(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "id_str": [f"id_{i:06d}" for i in range(n)],
            "const_col": ["same"] * n,
            "num_missing": rng.normal(10, 3, n),
            "num_mostly_missing": rng.normal(0, 1, n),
            "num_inf": rng.normal(5, 2, n),
            "num_outlier": rng.exponential(2.0, n),
            "num_skewed_pos": rng.lognormal(0.5, 1.0, n) + 0.1,
            "num_skewed_neg": np.concatenate(
                [rng.lognormal(0.0, 1.2, n - 50), -rng.exponential(1.0, 50)]
            ),
            "corr_a": rng.normal(0, 1, n),
            "cat_rare": rng.choice(
                ["alpha", "beta", "gamma"], n, p=[0.6, 0.3, 0.1]
            ),
            "cat_bool_str": rng.choice(["yes", "no"], n),
            "num_bool": rng.choice([0, 1], n).astype("int64"),
            "int_plain": rng.integers(0, 500, n).astype("int64"),
            "int_year": rng.integers(1950, 2020, n).astype("int64"),
            "factor_col": rng.choice(["r", "g", "b"], n),
            "target_cls": rng.choice([0, 1], n, p=[0.95, 0.05]).astype("int64"),
        }
    )
    df["corr_b"] = df["corr_a"] * 3.0 + rng.normal(0, 0.1, n)
    # inject missing
    miss_idx = rng.choice(n, int(0.30 * n), replace=False)
    df.loc[miss_idx, "num_missing"] = np.nan
    mm_idx = rng.choice(n, int(0.85 * n), replace=False)
    df.loc[mm_idx, "num_mostly_missing"] = np.nan
    # inject inf
    inf_idx = rng.choice(n, 7, replace=False)
    df.loc[inf_idx[:4], "num_inf"] = np.inf
    df.loc[inf_idx[4:], "num_inf"] = -np.inf
    # rare categories (2 values < 1%)
    rare_idx = rng.choice(n, 12, replace=False)
    df.loc[rare_idx[:6], "cat_rare"] = "rare_x"
    df.loc[rare_idx[6:], "cat_rare"] = "rare_y"
    # heavy tail outliers
    out_idx = rng.choice(n, 15, replace=False)
    df.loc[out_idx, "num_outlier"] = df.loc[out_idx, "num_outlier"] + 60.0
    return df


def messy_sdf(spark, n: int = 2000, seed: int = 42):
    pdf = messy_pdf(n, seed)
    return spark.createDataFrame(pdf), pdf

#!/usr/bin/env python3
"""Dev-only, driver-side: time a faithful pandas mirror of the
reference's clean_data (main.py:66-129) so BASELINE comparisons have a
measured single-node number instead of a vacuous one. NOT part of the
library (zero Python deps in the engine); pairs with
`sbt "runMain graft.PipelineBench <sfDir>"`, which times the Spark
port (graft.Pipeline.clean) of the same steps on the same parquet.

Usage: python3 scripts/bench_reference.py /root/testdata/sf0.1
"""
import json
import sys
import time

import pandas as pd


def clean_data(df):
    # mirror of reference main.py:66-129, step for step
    df = df.dropna(axis=1, how="all")
    for c in list(df.columns):                      # datetime detection (90%)
        if df[c].dtype == object:
            parsed = pd.to_datetime(df[c], errors="coerce")
            if parsed.notna().mean() >= 0.9:
                df[c] = parsed
    for c in df.select_dtypes("number").columns:    # median impute
        df[c] = df[c].fillna(df[c].median())
    for c in df.select_dtypes("object").columns:    # mode impute + encode
        m = df[c].mode()
        df[c] = df[c].fillna(m[0] if len(m) else "")
        if df[c].nunique() <= 32:
            df[c] = df[c].astype("category").cat.codes
        else:
            df[c] = df[c].map(df[c].value_counts())
    for c in list(df.select_dtypes("datetime").columns):  # calendar features
        df[f"{c}_year"] = df[c].dt.year
        df[f"{c}_month"] = df[c].dt.month
        df[f"{c}_day"] = df[c].dt.day
        df[f"{c}_hour"] = df[c].dt.hour
        df[f"{c}_dayofweek"] = df[c].dt.dayofweek
        df[f"{c}_weekofyear"] = df[c].dt.isocalendar().week
        df = df.drop(columns=[c])
    for c in df.select_dtypes("number").columns:    # IQR clip
        q1, q3 = df[c].quantile(0.25), df[c].quantile(0.75)
        iqr = q3 - q1
        df[c] = df[c].clip(q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    return df


def main(sf_dir):
    src = pd.read_parquet(f"{sf_dir}/events.parquet")
    times = []
    for _ in range(2):                              # min-of-2, like graft.Bench
        df = src.copy()
        t0 = time.time()
        out = clean_data(df)
        times.append(time.time() - t0)
    print(json.dumps({
        "metric": "reference_clean_pandas",
        "rows": int(len(out)), "cols": int(out.shape[1]),
        "sec": round(min(times), 3), "sf": sf_dir.rstrip("/").split("/")[-1],
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

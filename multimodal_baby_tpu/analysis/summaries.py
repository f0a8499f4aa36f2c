"""Prediction-JSON aggregation -> summary tables.

Capability parity with the Science-paper analysis entry point
(analysis_cvcl/clean.py): gather the predictions files written by
evaluation.forced_choice / cli.eval into tidy per-trial DataFrames and
per-class / per-checkpoint accuracy summaries (results/summary/*.csv
contract).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, List, Optional, Union


def load_predictions(paths: Union[str, Iterable]) -> "pandas.DataFrame":
    import pandas as pd

    if isinstance(paths, (str, Path)):
        paths = sorted(Path(".").glob(str(paths))) or [Path(paths)]
    rows: List[dict] = []
    for p in paths:
        with open(p) as f:
            payload = json.load(f)
        data = payload["data"] if isinstance(payload, dict) else payload
        for r in data:
            row = dict(r)
            row["categories"] = ",".join(row.get("categories", []))
            row["logits"] = json.dumps(row.get("logits", []))
            row["source_file"] = str(p)
            rows.append(row)
    return pd.DataFrame(rows)


def summarize(df: "pandas.DataFrame",
              group_keys: Optional[List[str]] = None) -> "pandas.DataFrame":
    """Accuracy per (checkpoint, seed, stage, target category)."""
    import pandas as pd

    df = df.copy()
    df["target_category"] = df["categories"].str.split(",").str[0]
    keys = group_keys or [k for k in
                          ("checkpoint", "seed", "stage", "eval_type")
                          if k in df.columns]
    per_class = (df.groupby(keys + ["target_category"])["correct"]
                 .agg(["mean", "count"]).reset_index()
                 .rename(columns={"mean": "accuracy", "count": "n_trials"}))
    total = (df.groupby(keys)["correct"].agg(["mean", "count"])
             .reset_index()
             .rename(columns={"mean": "accuracy", "count": "n_trials"}))
    total["target_category"] = "TOTAL"
    return pd.concat([per_class, total], ignore_index=True)


def write_summary(pred_glob: str, out_csv) -> "pandas.DataFrame":
    df = load_predictions(pred_glob)
    summary = summarize(df)
    Path(out_csv).parent.mkdir(parents=True, exist_ok=True)
    summary.to_csv(out_csv, index=False)
    return summary

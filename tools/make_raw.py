#!/usr/bin/env python3
"""Generate edge-case raw sensor parquet files for PipelineDemo:
two valid days (with injected duplicates and out-of-range values),
one schema-broken file, one corrupt non-parquet file. Mirrors the
reference's synthetic-raw generator behaviors."""
import sys, os
import pandas as pd
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipe/raw"
os.makedirs(out, exist_ok=True)
for f in os.listdir(out):
    os.remove(os.path.join(out, f))

rng = np.random.default_rng(7)
for day in ["2023-06-01", "2023-06-02"]:
    n = 200
    df = pd.DataFrame({
        "sensor_id": rng.choice(["sensor_1", "sensor_2", "sensor_3"], n),
        "timestamp": pd.to_datetime(day)
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "reading_type": rng.choice(["temperature", "humidity"], n),
        "value": rng.normal(25, 5, n),
        "battery_level": np.where(
            rng.random(n) < 0.1, np.nan, rng.uniform(20, 100, n)),
    })
    df.loc[df.sample(5, random_state=1).index, "value"] = 999.0
    df = pd.concat([df, df.head(3)])  # exact duplicates
    df.to_parquet(f"{out}/{day}.parquet", index=False)

pd.DataFrame({
    "sensor_id": ["x"],
    "timestamp": [pd.Timestamp("2023-06-03")],
    "reading_type": ["temperature"],
    "value": ["not_a_double"],  # wrong type
    "extra": [1],               # extra column; battery_level missing
}).to_parquet(f"{out}/2023-06-03_broken.parquet", index=False)

with open(f"{out}/2023-06-04_corrupt.parquet", "w") as f:
    f.write("this is not parquet")
print(f"raw files written to {out}")

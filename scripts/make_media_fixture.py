"""Write the committed synthetic-media parquet fixtures.

Run once (output is committed to git) so BOTH engines — Spark queries and
the duckdb oracle — read the identical bytes:

    python scripts/make_media_fixture.py

Outputs under tests/fixtures/:
    media.parquet        (media_id, content binary, media struct<...>)
    media_bytes.parquet  (media_id, byte_val) — content exploded one row per
                         byte, so the oracle can recompute the byte-histogram
                         features in plain SQL (GROUP BY byte_val // bin_w).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from elastic_surv_spark.functions.multimodal import synthetic_media_pandas  # noqa: E402

FIXTURE_DIR = Path(__file__).resolve().parents[1] / "tests" / "fixtures"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("content", pa.binary()),
        (
            "media",
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("sample_rate", pa.int32()),
                    ("duration_ms", pa.int32()),
                    ("codec", pa.string()),
                ]
            ),
        ),
    ]
)


def main(n: int = 96, seed: int = 7) -> None:
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    pdf = synthetic_media_pandas(n=n, seed=seed)

    media_tbl = pa.Table.from_pydict(
        {
            "media_id": pdf["media_id"].tolist(),
            "content": pdf["content"].tolist(),
            "media": pdf["media"].tolist(),
        },
        schema=MEDIA_SCHEMA,
    )
    pq.write_table(media_tbl, FIXTURE_DIR / "media.parquet")

    ids, vals = [], []
    for mid, payload in zip(pdf["media_id"], pdf["content"]):
        arr = np.frombuffer(payload, dtype=np.uint8)
        ids.append(np.full(arr.shape, mid, dtype=np.int64))
        vals.append(arr.astype(np.int32))
    bytes_tbl = pa.Table.from_pydict(
        {"media_id": np.concatenate(ids), "byte_val": np.concatenate(vals)},
        schema=pa.schema([("media_id", pa.int64()), ("byte_val", pa.int32())]),
    )
    pq.write_table(bytes_tbl, FIXTURE_DIR / "media_bytes.parquet")
    print(f"wrote {FIXTURE_DIR}/media.parquet ({media_tbl.num_rows} rows), "
          f"media_bytes.parquet ({bytes_tbl.num_rows} rows)")


if __name__ == "__main__":
    main()

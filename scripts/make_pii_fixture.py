"""Write the committed PII-redaction parquet fixture.

The testdata corpus deliberately contains no PII, so redaction gets its
oracle from a seeded fixture instead: deterministic texts with known PII
spans (emails, SSNs, IPv4s, phone numbers) mixed into clean prose, PLUS
golden `clean_text` / `n_pii` columns computed here with Python's `re` —
an engine independent of the JVM regex that executes the Spark query, so
the registry comparison is a real cross-engine check, not a tautology.

Run once (output committed to git):

    python scripts/make_pii_fixture.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from elastic_surv_spark.functions.text import PII_PATTERNS  # noqa: E402

FIXTURE_DIR = Path(__file__).resolve().parents[1] / "tests" / "fixtures"

# ASCII-only corpus: Python's re defaults \w to unicode while Java's is
# ASCII — identical on this input, so the golden is engine-portable.
TEXTS = [
    "contact us at support@example.com or sales@corp.io for a quote",
    "my ssn is 123-45-6789 and my backup is 987-65-4321 thanks",
    "server at 192.168.1.1 fell over; failover to 10.0.0.254 worked",
    "call +1 (555) 010-4477 today",
    "call 555 010 4477 or email ops@node7.example.net from 172.16.254.3",
    "no pii here just a perfectly ordinary sentence about ducks",
    "v1.2.3 released; build 2024.01.15 passed, nothing personal inside",
    "alice.bobson+spam@mail-host.co.uk pinged 8.8.8.8 re 111-22-3333",
    "tokens like a1b2c3 and x.y.z survive but 00-11-22-33 is not a phone",
    "edge: trailing email bob@x.ai",
    "mixed: 1.2.3.4 then 123-45-6789 then e@f.gg then +44 20 7946 0958 done",
    "a phone inside text 020 7946 0958, and one glued to punct: (5550104477).",
] * 4  # 48 rows — enough for a multi-partition read


def redact(text: str) -> tuple[str, int]:
    n = 0
    for pattern, token in PII_PATTERNS:
        text, k = re.subn(pattern, token, text)
        n += k
    return text, n


def main() -> None:
    rows = []
    for i, t in enumerate(TEXTS):
        clean, n = redact(t)
        rows.append({"doc_id": i, "text": t, "clean_text": clean, "n_pii": n})
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("clean_text", pa.string()),
                ("n_pii", pa.int64()),
            ]
        ),
    )
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    out = FIXTURE_DIR / "pii_docs.parquet"
    pq.write_table(table, out)
    total = sum(r["n_pii"] for r in rows)
    print(f"wrote {out} ({len(rows)} rows, {total} PII spans)")


if __name__ == "__main__":
    main()

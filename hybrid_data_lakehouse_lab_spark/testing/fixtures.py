"""Deterministic CDC fixtures — FIXTURES.md §B, covering every SCD2
branch of the reference (libs/scd2_spark_processor.py:229-276): insert
only; changed update; no-op update; update→delete; insert→delete;
multi-update batches; out-of-order arrival; delete→re-insert; events
straddling two dt partitions / two checkpoint runs.

All timestamps derive from a fixed base (2026-01-01T00:00:00Z), seed=42 —
identical output on every run.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
BASE_MS = int(BASE_TS.timestamp() * 1000)

CATEGORIES = ["Electronics", "Clothing", "Home", "Books", "Toys"]
PRODUCTS = {c: [f"{c} Item {i}" for i in range(1, 4)] for c in CATEGORIES}


def _image(id_: int, product: str, category: str, price: float, qty: int, day: int):
    return {
        "id": id_,
        "product_name": product,
        "category": category,
        "price": f"{price:.2f}",  # decimal-as-string (connectors.yaml:15)
        "quantity": qty,
        "sale_date": 20454 + day,  # epoch-days
        "created_at": BASE_MS,
    }


def make_cdc_events() -> list[dict]:
    """Ordered envelope payloads, one dict per change event."""
    rng = random.Random(42)
    events: list[dict] = []
    lsn = [1000]

    def emit(op: str, id_: int, minute: int, before=None, after=None):
        lsn[0] += 7
        events.append(
            {
                "payload": {
                    "before": before,
                    "after": after,
                    "op": op,
                    "ts_ms": BASE_MS + minute * 60_000,
                    "source": {
                        "db": "mydb",
                        "table": "source_sales",
                        "txId": lsn[0] // 2,
                        "lsn": lsn[0],
                    },
                }
            }
        )

    def img(id_: int, price: float, qty: int, cat: str = "Electronics", prod=None, day=0):
        return _image(id_, prod or PRODUCTS[cat][0], cat, price, qty, day)

    # 1: insert only
    emit("c", 1, 1, after=img(1, 10.0, 1))
    # 2: insert → changed update
    emit("c", 2, 2, after=img(2, 20.0, 1))
    emit("u", 2, 10, before=img(2, 20.0, 1), after=img(2, 25.0, 2))
    # 3: insert → no-op update (same business content)
    emit("c", 3, 3, after=img(3, 30.0, 1))
    emit("u", 3, 11, before=img(3, 30.0, 1), after=img(3, 30.0, 1))
    # 4: insert → update → delete
    emit("c", 4, 4, after=img(4, 40.0, 1))
    emit("u", 4, 12, before=img(4, 40.0, 1), after=img(4, 44.0, 3))
    emit("d", 4, 20, before=img(4, 44.0, 3))
    # 5: insert → delete
    emit("c", 5, 5, after=img(5, 50.0, 1))
    emit("d", 5, 21, before=img(5, 50.0, 1))
    # 6: multiple updates in one batch
    emit("c", 6, 6, after=img(6, 60.0, 1))
    emit("u", 6, 13, before=img(6, 60.0, 1), after=img(6, 61.0, 1))
    emit("u", 6, 14, before=img(6, 61.0, 1), after=img(6, 62.0, 2))
    emit("u", 6, 15, before=img(6, 62.0, 2), after=img(6, 63.0, 3))
    # 7: out-of-ts-order arrival within the batch (emit later event first)
    emit("u", 7, 31, before=img(7, 70.0, 1), after=img(7, 77.0, 2))
    emit("c", 7, 30, after=img(7, 70.0, 1))
    # 8: insert → delete → re-insert with identical content
    emit("c", 8, 8, after=img(8, 80.0, 1))
    emit("d", 8, 22, before=img(8, 80.0, 1))
    emit("c", 8, 40, after=img(8, 80.0, 1))
    # 9: snapshot-read op
    emit("r", 9, 9, after=img(9, 90.0, 1))
    # 100+: random mix across two days (dt partition straddle: minutes
    # beyond 1440 land on day 2)
    for id_ in range(100, 120):
        cat = rng.choice(CATEGORIES)
        price = float(rng.randint(10, 1000))
        minute = rng.randint(50, 1000)
        emit("c", id_, minute, after=img(id_, price, rng.randint(1, 5), cat))
        last = img(id_, price, rng.randint(1, 5), cat)
        for _ in range(rng.randint(0, 3)):
            minute += rng.randint(5, 600)
            nxt = img(id_, float(rng.randint(10, 1000)), rng.randint(1, 5), cat)
            emit("u", id_, minute, before=last, after=nxt)
            last = nxt
        if rng.random() < 0.3:
            minute += rng.randint(5, 600)
            emit("d", id_, minute, before=last)
    return events


def envelope_json_lines() -> list[str]:
    return [json.dumps(e, separators=(",", ":")) for e in make_cdc_events()]


def raw_envelope_df(spark: SparkSession) -> DataFrame:
    """Batch DataFrame of raw envelope JSON (the Kafka-source stand-in)."""
    lines = envelope_json_lines()
    return spark.createDataFrame([(s,) for s in lines], ["raw_message"])


def write_drop_dir(
    path: str,
    lines: list[str] | None = None,
    per_file: int = 20,
    prefix: str = "batch",
) -> int:
    """Write envelope JSON-lines into a file-drop dir (streaming source).

    ``prefix`` distinguishes successive drops into the SAME dir: the
    file source tracks seen paths, so a second drop must use fresh
    names (never overwrite batch-00000.jsonl — the source would ignore
    the modified path and the events would be silently lost)."""
    import os

    os.makedirs(path, exist_ok=True)
    lines = lines if lines is not None else envelope_json_lines()
    for i in range(0, len(lines), per_file):
        with open(os.path.join(path, f"{prefix}-{i:05d}.jsonl"), "w") as f:
            f.write("\n".join(lines[i : i + per_file]) + "\n")
    return len(lines)

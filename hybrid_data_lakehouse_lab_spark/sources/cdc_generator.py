"""PySpark-native CDC load generator — the reference's Postgres insert
loop (scripts/pinot_auto/data_gen_pg2.py:19-39, sales rows of
id/product/category/price/quantity/sale_date) re-expressed as a Spark 4
Python DataSource that emits Debezium-style envelope JSON directly (the
shape Debezium would publish for those inserts, connectors.yaml topic
``pg.public.source_sales``), so every downstream lane (flatten → bronze /
upsert / history / SCD2) consumes it exactly like the Kafka value stream.

Differences from the reference generator, by design:
* Deterministic — field values derive from md5(seed, id), not
  ``random``; the same options always produce byte-identical envelopes
  (replayable benchmarks, hash-stable tests).
* Partition-parallel — the id range is split across ``numPartitions``
  executor tasks instead of one psycopg2 loop; 100 TB of synthetic load
  is a cluster-wide map with no driver bottleneck.
* Dual-mode — ``spark.read`` for bounded backfills and
  ``spark.readStream`` (micro-batched, ``rowsPerBatch``) for the
  continuous-ingest path the reference drives with its infinite loop.

Usage::

    spark.dataSource.register(SalesCdcDataSource)
    df = spark.read.format("cdc_sales").option("rows", 10_000).load()
    stream = spark.readStream.format("cdc_sales").option("rowsPerBatch", 500).load()
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BASE_MS = 1_767_225_600_000  # 2026-01-01T00:00:00Z, matches testing.fixtures
EPOCH_DAY0 = 20454  # sale_date epoch-days origin (fixtures._image)

CATEGORIES = ["Electronics", "Clothing", "Home", "Books", "Toys"]
PRODUCTS = {c: [f"{c} Item {i}" for i in range(1, 4)] for c in CATEGORIES}


def _h(seed: int, id_: int, field: str) -> int:
    """Deterministic 60-bit value per (seed, id, field)."""
    raw = hashlib.md5(f"{seed}:{id_}:{field}".encode()).hexdigest()[:15]
    return int(raw, 16)


def _image(seed: int, id_: int, version: int) -> dict:
    cat = CATEGORIES[_h(seed, id_, "cat") % len(CATEGORIES)]
    price = 10 + (_h(seed, id_, f"price{version}") % 99100) / 100.0
    return {
        "id": id_,
        "product_name": PRODUCTS[cat][_h(seed, id_, "prod") % 3],
        "category": cat,
        "price": f"{price:.2f}",  # decimal-as-string (connectors.yaml:15)
        "quantity": 1 + (_h(seed, id_, f"qty{version}") % 5),
        "sale_date": EPOCH_DAY0 + (_h(seed, id_, "day") % 30),
        "created_at": BASE_MS,
    }


def envelope_for(
    seed: int, id_: int, hot_fraction: float = 0.0, hot_id: int = 1
) -> str:
    """One envelope JSON line per id: ~70% inserts, ~25% updates (with
    before-image), ~5% deletes — the op mix a steady-state Debezium
    topic carries for the reference's insert+touch workload.

    ``hot_fraction`` > 0 rewrites that fraction of the stream as UPDATE
    events for the SINGLE business key ``hot_id`` — the degenerate
    hot-entity workload (one row touched by half the topic) used to
    property-test skew mitigation. Hot events change content every 16th
    event (runs of identical images in between), the heartbeat-heavy
    shape a hot CDC entity really has; ts/lsn stay id-derived so event
    order and uniqueness are unchanged."""
    op_roll = _h(seed, id_, "op") % 100
    ts_ms = BASE_MS + (id_ % 86_400) * 1_000
    lsn = 1_000 + id_ * 7
    if hot_fraction > 0 and (_h(seed, id_, "hot") % 1000) < hot_fraction * 1000:
        version = id_ // 16
        op = "u"
        before = _image(seed, hot_id, max(version - 1, 0))
        after = _image(seed, hot_id, version)
    elif op_roll < 70:
        op, before, after = "c", None, _image(seed, id_, 0)
    elif op_roll < 95:
        op, before, after = "u", _image(seed, id_, 0), _image(seed, id_, 1)
    else:
        op, before, after = "d", _image(seed, id_, 0), None
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms,
                "source": {
                    "db": "mydb",
                    "table": "source_sales",
                    "txId": lsn // 2,
                    "lsn": lsn,
                },
            }
        },
        separators=(",", ":"),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SalesCdcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.start_id = int(options.get("startId", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.hot_fraction = float(options.get("hotFraction", 0.0))
        self.hot_id = int(options.get("hotId", 1))

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))
        out = []
        for lo in range(0, self.rows, per):
            hi = min(lo + per, self.rows)
            out.append(
                _RangePartition(self.start_id + lo, self.start_id + hi, self.seed)
            )
        return out

    def read(self, partition: _RangePartition):
        for id_ in range(partition.start, partition.end):
            yield (
                envelope_for(
                    partition.seed, id_, self.hot_fraction, self.hot_id
                ),
            )


class SalesCdcStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched twin: offset = next id. Each read() emits
    rowsPerBatch envelopes, endlessly unless maxRows bounds the stream
    (bounded + availableNow → deterministic drain, like the tests)."""

    def __init__(self, options: dict):
        self.start_id = int(options.get("startId", 1000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsPerBatch", 500))
        self.max_rows = int(options.get("maxRows", 0))  # 0 = unbounded
        # same knobs as the batch twin — the two readers must not
        # interpret identical options differently
        self.hot_fraction = float(options.get("hotFraction", 0.0))
        self.hot_id = int(options.get("hotId", 1))

    def initialOffset(self):
        return {"next": self.start_id}

    def read(self, start: dict):
        lo = start["next"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.start_id + self.max_rows)
        rows = [
            (envelope_for(self.seed, i, self.hot_fraction, self.hot_id),)
            for i in range(lo, hi)
        ]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            (envelope_for(self.seed, i, self.hot_fraction, self.hot_id),)
            for i in range(start["next"], end["next"])
        )


class SalesCdcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_sales"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> SalesCdcReader:
        return SalesCdcReader(self.options)

    def simpleStreamReader(self, schema) -> SalesCdcStreamReader:
        return SalesCdcStreamReader(self.options)

"""Custom source connector via the Python DataSource API (Spark 4).

The reference's only true "source" is a driver-side HTTP fetch
(fetch.py:19-31) that lands a file for a single-process read. This
connector shows the engine-native way to bring an external system into
Spark: implement ``DataSource``/``DataSourceReader`` with an explicit
``partitions()`` plan so the read is DISTRIBUTED — each partition is an
independent fetch task on an executor (at 100 TB: one partition per
API page / object-store shard / id range). Here the "external system"
is a deterministic in-process generator of ROR-shaped org records so
tests run offline; swapping the generator body for real HTTP calls
changes nothing about the Spark side.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _OrgRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RorSyntheticSource(DataSource):
    """``spark.read.format("ror_synth").option("n_orgs", N)``.

    Generates orgs ``org_0 .. org_{N-1}`` where each org's parent is the
    previous org except every ``chain_len``-th org, which is a root —
    the same forest shape as the golden rollup fixtures, so the full
    pipeline (edge extraction → fixpoint → attach) runs end-to-end on
    top of this connector in tests.
    """

    @classmethod
    def name(cls) -> str:
        return "ror_synth"

    def schema(self) -> str:
        return (
            "id string, status string, "
            "relationships array<struct<id: string, label: string, type: string>>"
        )

    def reader(self, schema) -> DataSourceReader:
        return _RorSyntheticReader(self.options)


class _RorSyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_orgs = int(options.get("n_orgs", 1000))
        self.chain_len = int(options.get("chain_len", 10))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n_orgs // self.n_partitions))
        return [
            _OrgRange(lo, min(lo + per, self.n_orgs))
            for lo in range(0, self.n_orgs, per)
        ]

    def read(self, partition: _OrgRange):
        for i in range(partition.start, partition.end):
            if i % self.chain_len == 0:
                rels = []
            else:
                rels = [(f"org_{i - 1}", "parent org", "Parent")]
            yield (f"org_{i}", "active", rels)


def register(spark) -> None:
    spark.dataSource.register(RorSyntheticSource)

from __future__ import annotations

import pytest

from beats_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("beats_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df, *cols):
    """Sorted list-of-tuples helper for order-insensitive asserts."""
    sel = df.select(*cols) if cols else df
    return sorted(
        (tuple(r) for r in sel.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )

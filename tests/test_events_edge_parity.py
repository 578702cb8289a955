"""Adversarial-distribution parity for the events-table faces.

Same method as tests/test_tpch_edge_parity.py, aimed at the hazards the
smooth events fixture never produces:

- duplicate (user_id, ts) pairs with different event types -- the tie
  case for every ordered window (sessionize order, paths lead(),
  markov transitions, funnel stage anchors): a query whose window
  order is not unique would go nondeterministic here and break parity;
- events landing EXACTLY on an hour boundary (OHLC / gap-fill / cube
  bucket edges);
- a single-event user and a two-event same-timestamp user;
- degenerate props JSON ("{}" with the extracted key missing, plus a
  superset object) for the JSON-extraction face;
- a user whose span exceeds the 168 h gap-fill retention clamp.

All 14 events-reading oracled faces must match their DuckDB oracles on
this distribution.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from oracle_utils import compare, run_oracle

SRC = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

EVENT_QUERIES = [
    "events_funnel", "events_retention_cohorts", "events_ohlc",
    "events_type_pivot", "events_type_unpivot", "events_user_paths",
    "interval_overlap_errors", "quota_sliding_window",
    "events_sessionize", "events_cube_summary", "events_json_extract",
    "events_gap_fill", "events_markov_transitions", "events_anomaly_mad",
    # kv/changelog/temporal faces that derive their op streams from
    # events -- the duplicate-ts rows stress as-of tie-breaks and
    # last-write-wins replay ordering
    "changelog_authdiff", "changelog_replay", "changelog_asof",
    "kv_top_mru", "asof_click_attribution", "range_join_prior_activity",
    "scd2_profile_versions", "changelog_incremental_agg",
]

N_EVENTS = 800


@pytest.fixture(scope="session")
def events_edge_dir(tmp_path_factory):
    rng = np.random.RandomState(int(os.environ.get("SPARK_GRAFT_EDGE_SEED", "88")))
    out = str(tmp_path_factory.mktemp("events_edge"))
    real = pd.read_parquet(os.path.join(SRC, "events.parquet"))

    def boot(col, n):
        return real[col].to_numpy()[rng.randint(0, len(real), n)]

    ev = pd.DataFrame({
        "event_id": np.arange(N_EVENTS),
        "ts": boot("ts", N_EVENTS),
        "user_id": rng.randint(0, 12, N_EVENTS),
        "event_type": boot("event_type", N_EVENTS),
        "value": boot("value", N_EVENTS),
        "props": boot("props", N_EVENTS),
    })

    t0 = pd.Timestamp("2024-01-05 00:00:00")       # exact hour boundary
    crafted = pd.DataFrame({
        "event_id": np.arange(10_000, 10_011),
        "ts": [
            # user 100: view and click at the SAME microsecond, then a
            # purchase -- the funnel stage-anchor tie and the ordered-
            # window tie in one
            t0, t0, t0 + pd.Timedelta(minutes=1),
            # user 101: two events at the same ts, nothing else
            t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=1),
            # user 102: a single event exactly on an hour boundary
            t0 + pd.Timedelta(hours=2),
            # user 103: >168h span (gap-fill clamp bites), endpoints only
            t0, t0 + pd.Timedelta(hours=200),
            # user 104: error burst adjacent to a view session
            # (interval-overlap face), duplicate-ts errors
            t0 + pd.Timedelta(hours=3),
            t0 + pd.Timedelta(hours=3),
            t0 + pd.Timedelta(hours=3, minutes=5),
        ],
        "user_id": [100, 100, 100, 101, 101, 102, 103, 103, 104, 104, 104],
        "event_type": ["view", "click", "purchase", "view", "purchase",
                       "signup", "view", "purchase", "error", "error",
                       "view"],
        "value": [10.0, 10.0, 5.0, 1.0, 1.0, 0.0, 2.0, 2.0, 99.0, 99.0,
                  3.0],
        "props": ["{}", '{"k": 5, "x": {"y": 1}}', '{"k": 0}', "{}",
                  '{"k": 1}', '{"k": 2}', '{"k": 3}', '{"k": 4}',
                  '{"k": 5}', "{}", '{"k": 6}'],
    })
    ev = pd.concat([ev, crafted], ignore_index=True)

    schema = pq.read_schema(os.path.join(SRC, "events.parquet"))
    pq.write_table(
        pa.Table.from_pandas(ev[schema.names], schema=schema,
                             preserve_index=False),
        os.path.join(out, "events.parquet"))
    return out


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_parity_on_adversarial_fixture(spark, events_edge_dir, name):
    problems = compare(_QUERIES[name](spark, events_edge_dir),
                       run_oracle(_ORACLES[name], events_edge_dir))
    assert not problems, (name, problems)


class TestCraftedEventSemantics:
    def test_single_and_tied_users_sessionize(self, spark, events_edge_dir):
        rows = _QUERIES["events_sessionize"](spark, events_edge_dir).collect()
        users = {r["user_id"] for r in rows}
        assert {100, 101, 102, 103, 104} <= users

    def test_gap_fill_clamps_the_long_span_user(self, spark,
                                                events_edge_dir):
        rows = _QUERIES["events_gap_fill"](spark, events_edge_dir).collect()
        by = {r["user_id"]: r for r in rows}
        assert 103 in by
        # 200h raw span, clamped to the 168h retention window
        assert by[103]["n_hours"] <= 169

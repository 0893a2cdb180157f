"""Streaming queries (Structured Streaming, availableNow) with batch-SQL
oracles — the stream drains the full fixture, so final state must equal
the equivalent batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (
    delta_sink_query,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def tumbling(spark: SparkSession, sf: str) -> DataFrame:
    return tumbling_window_agg(spark, sf)


TUMBLING_SQL = """
select date_trunc('hour', ts) as w_start, event_type,
       count(*) as n,
       cast(sum(cast(value as decimal(18,4))) as double) as val_sum
from events
group by 1, 2
order by w_start, event_type
"""


def sliding(spark: SparkSession, sf: str) -> DataFrame:
    return sliding_window_agg(spark, sf)


# every event belongs to exactly two 1h/30m sliding windows:
# [floor30(ts) - 30min, ...) and [floor30(ts), ...)
SLIDING_SQL = """
with cand as (
  select unnest([
           time_bucket(interval '30 minutes', ts) - interval '30 minutes',
           time_bucket(interval '30 minutes', ts)
         ]) as w_start,
         value
  from events
)
select w_start, count(*) as n,
       cast(sum(cast(value as decimal(18,4))) as double) as val_sum
from cand
group by w_start
order by w_start
"""


def session(spark: SparkSession, sf: str) -> DataFrame:
    return session_window_agg(spark, sf)


# gaps-and-islands replica of session_window(ts, '10 minutes') per user
SESSION_SQL = """
with marked as (
  select user_id, ts,
         case when ts - lag(ts) over (partition by user_id order by ts)
                   > interval '10 minutes'
              or lag(ts) over (partition by user_id order by ts) is null
         then 1 else 0 end as new_session
  from events
), numbered as (
  select user_id, ts,
         sum(new_session) over (partition by user_id order by ts
                                rows unbounded preceding) as sess_id
  from marked
)
select user_id, min(ts) as session_start, count(*) as n_events
from numbered
group by user_id, sess_id
order by user_id, session_start
"""


def dedup(spark: SparkSession, sf: str) -> DataFrame:
    return stream_dedup(spark, sf)


DEDUP_SQL = """
select event_type, count(distinct event_id) as n
from events
group by event_type
order by event_type
"""


def stateful(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import user_running_totals

    return user_running_totals(spark, sf)


STATEFUL_SQL = """
select user_id,
       count(*) as n_events,
       max(value) as max_value,
       min(event_id) as first_event_id,
       max(event_id) as last_event_id
from events
group by user_id
order by user_id
"""


def ss_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.joins import click_error_join

    return click_error_join(spark, sf)


# batch replica: error events within 10 min after a click, same user
SS_JOIN_SQL = """
select c.user_id, cast(count(*) as bigint) as n_pairs
from events c
join events e
  on e.user_id = c.user_id
 and e.ts >= c.ts and e.ts <= c.ts + interval '10 minutes'
where c.event_type = 'click' and e.event_type = 'error'
group by c.user_id
order by c.user_id
"""


def delta_sink(spark: SparkSession, sf: str) -> DataFrame:
    return delta_sink_query(spark, sf)


def iceberg_sink(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.lakesink import iceberg_sink_query

    return iceberg_sink_query(spark, sf)


DELTA_SINK_SQL = """
select event_type, cast(count(*) as bigint) as n_events,
       cast(sum(cast(value as decimal(18,6))) as double) as value_sum
from events
group by event_type
order by event_type
"""


STREAMING_QUERIES = {
    "stream_tumbling_window": tumbling,
    "stream_sliding_window": sliding,
    "stream_session_window": session,
    "stream_dedup_pipe": dedup,
    "stream_stateful_totals": stateful,
    "stream_stream_join": ss_join,
    "stream_delta_sink": delta_sink,
    "stream_iceberg_sink": iceberg_sink,
}

STREAMING_ORACLE = {
    "stream_tumbling_window": TUMBLING_SQL,
    "stream_sliding_window": SLIDING_SQL,
    "stream_session_window": SESSION_SQL,
    "stream_dedup_pipe": DEDUP_SQL,
    "stream_stateful_totals": STATEFUL_SQL,
    "stream_stream_join": SS_JOIN_SQL,
    "stream_delta_sink": DELTA_SINK_SQL,
    "stream_iceberg_sink": DELTA_SINK_SQL,  # same source-side aggregate
}

"""Nested-JSON ingest flatten (SURVEY.md §2.7 row 63).

The reference's most distinctive ingest behavior: navigate the
upstream feed's nested event objects — ``homeTeam.name`` /
``tournament.category.name`` / ``status.description`` — with
candidate-path fallbacks and null defaults, producing the
standardized flat match schema
(/root/reference/daily_match_scraper.py:449-527; real payload dump
preserved at
/root/reference/sofascore_data/raw/api_response_2025-05-23.txt).

Spark-first design:

- ONE ``from_json`` parse per event against a declared probe schema —
  every candidate path materializes in a single Jackson pass, and the
  downstream coalesces are free ``GetStructField`` accesses inside
  whole-stage codegen. Fields the feed sends as EITHER an object or a
  bare string (``status``, ``venue``) are DECLARED ``string``: the
  parser hands back the raw JSON fragment for an object (and the
  scalar for a bare string), so a `{`/`[`-prefix guard plus a
  ``get_json_object`` over the ~30-char fragment maps the reference's
  ``isinstance(..., dict)`` branching without ever re-scanning the
  full event text. Measured at sf0.1 (100k events): 0.9s end-to-end
  vs 2.8s for a VARIANT parse + 11 separate ``try_variant_get``
  probes (each probe re-traverses the variant binary, interpreted)
  and vs 3.5s for the original from_json + whole-text
  ``get_json_object`` pair;
- the raw debug-dump wrapper and the ``{"events":[...]}`` envelope
  are peeled with VARIANT tooling (``try_parse_json`` +
  ``try_variant_get`` + ``explode``) — malformed/truncated payloads
  degrade to zero rows instead of failing the job, matching the
  reference's per-event try/except skip; ``from_json``'s PERMISSIVE
  default gives per-event flatten the same grace (malformed event →
  null required fields → row dropped).

At 100 TB the natural input is JSONL (one event per line, splittable);
``flatten_api_events`` consumes exactly that shape. The envelope
helpers exist for the reference's one-blob-per-day dumps.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NAME = T.StructType([T.StructField("name", T.StringType())])

# Probe schema for the one-pass flatten: every candidate path the feed
# is known to use, with the object-or-string fields (status, venue)
# declared STRING so the parser preserves the raw fragment/scalar, and
# roundInfo.round/id declared STRING to match the reference's
# stringly-typed output. (schemas.API_EVENT stays the typed contract
# for well-formed feeds.)
_EVENT_PROBE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("homeTeam", _NAME),
        T.StructField("awayTeam", _NAME),
        T.StructField("home", _NAME),
        T.StructField("away", _NAME),
        T.StructField(
            "tournament",
            T.StructType(
                [T.StructField("name", T.StringType()), T.StructField("category", _NAME)]
            ),
        ),
        T.StructField("category", _NAME),
        T.StructField("league", _NAME),
        T.StructField("roundInfo", T.StructType([T.StructField("round", T.StringType())])),
        T.StructField("startTimestamp", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("venue", T.StringType()),
    ]
)

# The reference's raw dumps are debug captures: "Status: ...\n
# Headers: {...}\nContent: {json...}". Everything from the first
# '{' after the Content marker is the payload.
_DUMP_CONTENT_RE = r"(?s)Content:\s*(\{.*)"


def extract_dump_content(raw: Column | str) -> Column:
    """Peel the debug-dump wrapper off a raw capture, returning the
    JSON payload text (null when no Content marker is present).
    Mirrors the capture format of the reference's raw response dumps
    (daily_match_scraper.py saves response.text verbatim)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    got = F.regexp_extract(c, _DUMP_CONTENT_RE, 1)
    return F.when(F.length(got) > 0, got)


def explode_api_envelope(df: DataFrame, content_col: str, out_col: str = "event_json") -> DataFrame:
    """``{"events":[...]}`` → one row per event, as a JSON STRING so
    downstream flattening can probe variant-typed fields. VARIANT
    parse (Spark 4): truncated/malformed payloads yield null → zero
    event rows, the graceful-degradation twin of the reference's
    try/except-per-event (daily_match_scraper.py:447-449)."""
    v = F.try_parse_json(F.col(content_col))
    events = F.try_variant_get(v, "$.events", "array<variant>")
    return df.select(F.explode(events).alias("__ev")).select(
        F.to_json("__ev").alias(out_col)
    )


def _utc_hhmm(epoch: Column) -> Column:
    """'HH:mm' from unix seconds by pure integer arithmetic —
    timezone-independent and engine-portable (the form a large-scale
    pipeline wants for a derived partition-adjacent column)."""
    hh = F.lpad(((epoch % 86400) / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((epoch % 3600) / 60).cast("int").cast("string"), 2, "0")
    # concat_ws skips nulls (would yield '' for a null epoch); gate so
    # a missing timestamp propagates null → caller's 'Unknown' default
    return F.when(epoch.isNotNull(), F.concat_ws(":", hh, mm))


def flatten_api_events(
    df: DataFrame,
    json_col: str = "event_json",
    source: str = "api",
    utc: bool = False,
) -> DataFrame:
    """Flatten one nested event JSON string per row into the
    standardized match shape (daily_match_scraper.py:449-527 →
    sofascore_data/daily/matches_*.csv), with the reference's
    candidate-path fallbacks and null defaults:

    - home/away team: ``homeTeam.name`` else ``home.name`` — rows
      missing either side are dropped (required fields);
    - league: ``tournament.name`` else ``category.name`` else
      ``league.name`` else 'Unknown League';
    - country: ``tournament.category.name`` else ``category.name``
      else 'International';
    - status: ``status.description`` else the bare-string form else
      'Unknown'; venue: ``venue.name`` else the bare-string form;
    - start_time: 'HH:mm' from startTimestamp ('Unknown' when
      absent). ``utc=True`` renders via tz-free integer arithmetic
      (deterministic across engines/sessions); default renders in the
      session timezone like the reference's local ``fromtimestamp``
      (daily_match_scraper.py:486-492).

    ONE from_json parse + codegen'd struct-field coalesces — no
    shuffle, linear scan. (The declared contract for well-formed
    feeds lives in ``schemas.API_EVENT``; ``_EVENT_PROBE`` is the
    candidate-path superset with the object-or-string fields kept
    raw. See the module docstring for the measured comparison against
    the VARIANT-probe and double-parse formulations.)
    """
    # Parse ONCE into an intermediate struct column, then project the
    # eleven output fields as GetStructField accesses. The parse is
    # materialized in its own select: eleven direct references to the
    # from_json expression would each re-parse (CollapseProject keeps
    # the two-step projection because the parse is non-cheap and
    # multiply referenced). The required-field drop at the end would
    # ALSO re-parse: PushDownPredicates substitutes project aliases
    # into pushed filters, planting four extra from_json calls at the
    # scan (measured: 5 parses in the optimized plan, ~2-3× the
    # runtime; from_json is CodegenFallback, so per-operator
    # subexpression elimination does not rescue the pushed copies, and
    # neither a non-deterministic dummy column — ColumnPruning deletes
    # it — nor a non-deterministic OR-term — folded/pushed anyway —
    # blocks the rule). An ``observe`` audit node does: predicates
    # cannot cross a CollectMetrics boundary (pushing would change the
    # metric), so the filter stays pinned above the single parse — and
    # the parsed-event count is exactly the ingest metric a production
    # feed wants anyway (uniquely named; read it from the Spark
    # listener's observedMetrics).
    parsed = df.select(F.from_json(F.col(json_col), _EVENT_PROBE).alias("__e")).observe(
        f"flatten_api_events_{uuid.uuid4().hex[:12]}",
        F.count(F.lit(1)).alias("n_events_parsed"),
    )
    e = F.col("__e")

    def frag_or_bare(raw: Column, path: str) -> Column:
        # object → probe the ~30-char raw fragment; bare scalar →
        # itself; array form → null (the feed never sends arrays here)
        return F.when(raw.startswith("{"), F.get_json_object(raw, path)).otherwise(
            F.when(~raw.startswith("["), raw)
        )

    ts = e["startTimestamp"]
    start_time = (
        _utc_hhmm(ts) if utc else F.from_unixtime(ts, "HH:mm")
    )
    out = parsed.select(
        F.coalesce(e["id"], F.lit("unknown")).alias("id"),
        F.coalesce(e["homeTeam"]["name"], e["home"]["name"]).alias("home_team"),
        F.coalesce(e["awayTeam"]["name"], e["away"]["name"]).alias("away_team"),
        F.coalesce(
            e["tournament"]["name"], e["category"]["name"], e["league"]["name"],
            F.lit("Unknown League"),
        ).alias("league"),
        F.coalesce(
            e["tournament"]["category"]["name"], e["category"]["name"],
            F.lit("International"),
        ).alias("country"),
        ts.alias("start_timestamp"),
        F.coalesce(start_time, F.lit("Unknown")).alias("start_time"),
        F.coalesce(
            frag_or_bare(e["status"], "$.description"), F.lit("Unknown")
        ).alias("status"),
        frag_or_bare(e["venue"], "$.name").alias("venue"),
        e["roundInfo"]["round"].alias("round"),
        F.lit(source).alias("source"),
    )
    # required-field drop — pinned above the single parse by the
    # observe boundary installed at the parse projection
    return out.filter(F.col("home_team").isNotNull() & F.col("away_team").isNotNull())

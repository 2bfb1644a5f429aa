"""As-of (point-in-time) join — the temporal join Spark's DataFrame API
lacks natively, expressed as a composition Catalyst can optimize.

For each left row, attach the single most recent right row of the same
key whose timestamp is strictly before (or at, ``strict=False``) the
left row's timestamp — "the user's last click before this purchase",
"the feature value in effect when this sample was taken". The workhorse
of point-in-time-correct training-data assembly: a plain range join
(``l.ts >= r.ts``) explodes to one row per (left, EVERY earlier right)
pair before a greatest-ts filter can prune; at 10^9 rows per side that
intermediate is quadratic per key and unrunnable.

Implementation is the scalable union+window pattern instead:

    tag side → unionByName → one hash partition on the key →
    in-partition sort by (ts, side) → last(right payload, ignorenulls)
    over ROWS UNBOUNDED PRECEDING → keep left rows

Exactly ONE shuffle (of |L|+|R| rows, never |L|×|R|), one sort, no
join node at all — the same plan shape as sessionization, and AQE's
skew handling applies to the single Exchange. Strictness is encoded in
the SORT ORDER at equal timestamps (left before right ⇒ a left row
never sees a same-instant right row; the reverse for ``strict=False``),
so no per-row comparison logic survives into the plan.

Determinism: among right rows tied on (key, ts) the surviving payload is
order-dependent — the same ambiguity DuckDB's / pandas' ASOF leave
unspecified. Callers needing bit-stable output across engines should
ensure (key, ts) uniqueness on the right (true for the events table, and
asserted by the oracle harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    strict: bool = True,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the most
    recent ``right`` row per ``on`` key with ``right_ts < left_ts``
    (``<=`` when ``strict=False``); right payload columns are NULL when
    no such row exists (left rows are never dropped).

    Right payload = every ``right`` column except the ``on`` keys
    (including ``right_ts`` itself, so the match's timestamp comes back);
    payload names must not collide with ``left``'s — rename before
    calling (an explicit contract beats silent suffixing).
    """
    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}; rename before joining")
    _internal = {_SIDE, _TS, "_asof_payload"}
    reserved = _internal & set(left.columns) | _internal & set(right.columns)
    if reserved:
        raise ValueError(f"{sorted(reserved)} are reserved by asof_join; rename before joining")
    if left_ts not in lpay or right_ts not in rpay:
        raise ValueError("left_ts/right_ts must be non-key columns of their side")

    # Equi-join NULL semantics (code-review r5, both reproduced live):
    # a NULL key never matches (`l.k = r.k` is never true on NULLs), and
    # a NULL right_ts is never "before" anything (`r.ts < l.ts` is never
    # true) — but the window composition would happily partition NULL
    # keys together and sort NULL timestamps FIRST, where the running
    # last() absorbs them. Drop such right rows up front; left rows keep
    # LEFT-join semantics (retained, NULL payload) in both cases because
    # a NULL-key left row then shares its partition with no right row and
    # a NULL-ts left row sorts before every surviving right row.
    keep_right = F.col(right_ts).isNotNull()
    for k in on:
        keep_right = keep_right & F.col(k).isNotNull()
    right = right.where(keep_right)

    from pyspark.sql import types as T

    ltypes = {f.name: f.dataType for f in left.schema.fields}
    # The right payload travels as ONE struct, matched by ONE
    # last(ignorenulls) — per-column last() would TEAR the matched row
    # apart whenever one of its payload values is genuinely NULL,
    # backfilling that column from an OLDER right row and emitting a
    # combination that exists on neither side (code-review r5).
    ptype = T.StructType([f for f in right.schema.fields if f.name in rpay])
    payload = "_asof_payload"
    l2 = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(ptype).alias(payload),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpay],
        F.struct(*[F.col(c) for c in rpay]).alias(payload),
    )
    # strict: left sorts BEFORE right at equal ts, so the running
    # last() cannot have absorbed a same-instant right row yet
    side_order = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    m = F.last(payload, ignorenulls=True).over(w)
    u = u.select(
        *on,
        _SIDE,
        *lpay,
        *[m[c].alias(c) for c in rpay],
    )
    return u.where(F.col(_SIDE) == 1).drop(_SIDE)

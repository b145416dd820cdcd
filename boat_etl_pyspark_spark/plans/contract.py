"""Shared ingest-validity contract (round-9 hostile-value classes).

The round-8 hostile-shape probe replayed domain-edge rows through all
consumers in both engines and attributed every latent divergence to one
of four value classes. The policy here is the same one round 7 pinned
for NULL/NaN/Inf measurements: values outside a DOCUMENTED validity
domain are corrupt ingest and are excluded by the SAME predicate in the
Spark plan and the DuckDB oracle — never handled by engine-specific
arithmetic that the other engine cannot reproduce. Each constant below
is the single source of truth; plans interpolate these fragments into
their SQL templates (or apply them via ``F.expr``), so the symmetric
predicate cannot drift between engines.

Why bounds instead of widening, per class:

* **Money values** (``events.value``): cents are exact BIGINTs, and
  several operators multiply cents by small integers (bin widths,
  ppm scalers <= ~1e5). A TRY_CAST-castable but absurd value (cents
  9.21e18) overflows those products — DuckDB BIGINT arithmetic THROWS
  while Spark wraps. Widening to DECIMAL costs 128-bit arithmetic on
  every row of the hot path and still overflows eventually; bounding
  |value| <= 1e12 dollars (cents <= 1e14, x1e4 multipliers <= 1e18)
  is scan-pushdown-able and honest about what a money column may
  contain. At 100 TB the bound is the documented knob: raise it and
  the multiplier budget shrinks proportionally.
* **Embeddings**: the corpus contract fixes the dimension (the fixture
  generator writes 64); a ragged/empty vector has no geometry. numpy
  ``np.stack`` CRASHES on ragged batches and per-dimension SQL joins
  silently count short vectors one-sided — ``size(embedding) = 64``
  excludes both failure modes identically in both engines.
* **Event time**: Structured Streaming initializes every stream's
  watermark at epoch 0, so a PRE-EPOCH event time is late-by-
  construction and silently dropped by stateful operators in their
  first micro-batch — correct streaming semantics with no batch-oracle
  counterpart (bisected: commit b285e49). Bounding event time to the
  pipeline's operational window [2000-01-01, 2100-01-01) with a
  post-1970 lower edge eliminates the asymmetry by construction and
  prunes parquet row groups at scale.
* **Text**: C0 control bytes (except tab/newline) break the XML 1.0
  character model (the writer THROWS) and CSV reassembly; invisible
  formatting codepoints (soft hyphen, zero-widths, BOM) diverge
  between Python ``unicodedata`` and DuckDB's utf8proc length /
  normalization semantics. Neither class carries text content — a
  document containing one is corrupt ingest. Token-shaped operators
  additionally bound token length: a 100k-char "token" is not a
  token, and the pair space it mints is quadratic garbage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Money-value domain (events.value, dollars)
# ---------------------------------------------------------------------------

#: |value| bound in dollars. Cents (x100) stay <= 1e14, so products
#: with multipliers up to ~9e4 (ppm scalers, bin counts, epoch-day
#: coordinates) stay exact in signed INT64 in both engines.
VALUE_DOMAIN_DOLLARS = 1.0e12

#: Row-level predicate (drops NULL too — use where the query already
#: filters rows without a usable value). BETWEEN is pushdown-able to
#: the parquet scan; NaN fails the upper compare and +/-Inf fail one
#: side in both engines, so the bound subsumes the non-finite net.
VALUE_DOMAIN_SQL = "value BETWEEN -1.0e12 AND 1.0e12"

#: Value-level form: out-of-domain behaves exactly like NULL (keeps
#: the row; its measurement contributes nothing) — use where the row
#: must survive for counting/densification semantics.
VALUE_BOUNDED_SQL = "(CASE WHEN value BETWEEN -1.0e12 AND 1.0e12 THEN value END)"


def value_bounded(col: Column) -> Column:
    """DataFrame-API twin of ``VALUE_BOUNDED_SQL``."""
    return F.when(
        col.between(-VALUE_DOMAIN_DOLLARS, VALUE_DOMAIN_DOLLARS), col
    )


def money_bounded_sql(col: str) -> str:
    """Value-level money-domain fragment for a raw TPC-H money column
    (``o_totalprice``, ``l_extendedprice``, ``c_acctbal``,
    ``s_acctbal``, ``p_retailprice``): out-of-domain (or non-finite —
    NaN/Inf fail BETWEEN) behaves exactly like NULL. REQUIRED (not
    merely defensive) wherever the ingest uses ``floor``: Spark's
    ``floor(double)`` returns LONG, silently minting 0 for NaN and
    Long.MAX for +Inf BEFORE any TRY_CAST can intervene, where
    DuckDB's floor stays DOUBLE and TRY_CAST yields NULL."""
    return (
        f"(CASE WHEN {col} BETWEEN -1.0e12 AND 1.0e12 THEN {col} END)"
    )


def money_domain_sql(col: str) -> str:
    """Row-level money-domain predicate (drops NULL too — NaN fails
    the upper compare and ±Inf fail one side in BOTH engines, so the
    bound subsumes the non-finite net). Use where the query has no
    use for a row without a usable money value: BETWEEN is
    scan-pushdown-able, and it keeps NULL/NaN out of order statistics
    where engine NULL/NaN placement differs."""
    return f"{col} BETWEEN -1.0e12 AND 1.0e12"


def money_domain(col: str) -> Column:
    """DataFrame-API twin of ``money_domain_sql``."""
    return F.expr(money_domain_sql(col))


def money_cents_sql(col: str, scale: int = 100) -> str:
    """Full floor-based cents ingest for a raw money column, with the
    domain bound applied BEFORE the floor (see ``money_bounded_sql``
    for why the order is load-bearing). ``scale=1`` is the whole-
    dollar grid form (no multiplication). The same text is valid
    Spark SQL and DuckDB SQL, so plans interpolate this one fragment
    on both sides."""
    mul = f" * {scale}" if scale != 1 else ""
    return f"TRY_CAST(floor({money_bounded_sql(col)}{mul}) AS BIGINT)"


def money_cents(col: str, scale: int = 100) -> Column:
    """DataFrame-API twin of ``money_cents_sql`` — the SAME fragment
    via ``F.expr``, so the three DataFrame-side floor ingests cannot
    drift from their oracles (round-9 ADVICE: the bound was applied
    one-sided there)."""
    return F.expr(money_cents_sql(col, scale))


def money_rounded_sql(col: str, scale: int = 100) -> str:
    """Round-based twin of ``money_cents_sql`` for the sites that use
    ROUND instead of floor. ROUND keeps non-finite doubles non-finite
    in both engines (so TRY_CAST alone already nulls NaN/Inf
    symmetrically); the domain CASE is still REQUIRED wherever the
    resulting integer feeds a product or square — a TRY_CAST-castable
    9.21e18 meets any multiplier and DuckDB throws where Spark wraps."""
    mul = f" * {scale}" if scale != 1 else ""
    return f"TRY_CAST(ROUND({money_bounded_sql(col)}{mul}) AS BIGINT)"


def money_rounded(col: str, scale: int = 100) -> Column:
    """DataFrame-API twin of ``money_rounded_sql``."""
    return F.expr(money_rounded_sql(col, scale))


#: l_quantity ingest domain = the data contract's documented rule
#: (validate_data_contract counts violations of exactly [1, 50]); a
#: 1e15 "quantity" is corrupt ingest and its cents/squares would
#: overflow INT64 products where DuckDB throws and Spark wraps.
QTY_DOMAIN_LO, QTY_DOMAIN_HI = 1.0, 50.0


def qty_bounded_sql(col: str = "l_quantity") -> str:
    return (
        f"(CASE WHEN {col} BETWEEN {QTY_DOMAIN_LO} AND {QTY_DOMAIN_HI}"
        f" THEN {col} END)"
    )


def qty_scaled_sql(col: str = "l_quantity", scale: int = 100) -> str:
    """Bounded quantity as an exact scaled integer (centi-units by
    default). The [1, 50] contract keeps every product with bounded
    cents inside INT64."""
    mul = f" * {scale}" if scale != 1 else ""
    return f"TRY_CAST(ROUND({qty_bounded_sql(col)}{mul}) AS BIGINT)"


def qty_scaled(col: str = "l_quantity", scale: int = 100) -> Column:
    """DataFrame-API twin of ``qty_scaled_sql``."""
    return F.expr(qty_scaled_sql(col, scale))


def revenue_cents_sql(
    price: str = "l_extendedprice", disc: str = "l_discount"
) -> str:
    """The TPC-H compound revenue ingest ``price * (1 - discount)`` as
    exact bounded cents: both factors are domain-bounded (money
    |x| <= 1e12, rate [0, 1]) so the product stays <= 1e14 cents —
    inside every downstream multiplier budget — and a corrupt factor
    nulls the whole term identically in both engines."""
    return (
        f"TRY_CAST(ROUND({money_bounded_sql(price)}"
        f" * (1 - {rate_bounded_sql(disc)}) * 100) AS BIGINT)"
    )


def revenue_cents(
    price: str = "l_extendedprice", disc: str = "l_discount"
) -> Column:
    """DataFrame-API twin of ``revenue_cents_sql``."""
    return F.expr(revenue_cents_sql(price, disc))


#: l_discount / l_tax ingest domain: rates live in [0, 1] (the data
#: contract's discount rule is [0, 0.10]; [0, 1] is the generous
#: bound that still keeps every (1 - rate) revenue factor in [0, 1]).
def rate_bounded_sql(col: str) -> str:
    return f"(CASE WHEN {col} BETWEEN 0.0 AND 1.0 THEN {col} END)"


def rate_scaled_sql(col: str, scale: int = 10000) -> str:
    """Bounded rate as an exact scaled integer (basis points by
    default); out-of-domain/non-finite rates behave like NULL."""
    return f"TRY_CAST(ROUND({rate_bounded_sql(col)} * {scale}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Embedding-vector validity (embeddings.embedding)
# ---------------------------------------------------------------------------

#: Corpus embedding dimension (the data contract's generator writes
#: fixed-width vectors; see TESTDATA.md).
EMB_DIMS = 64

#: Full vector-validity rule: present, exactly EMB_DIMS wide, every
#: element present/finite/sane. Spark and DuckDB spell the element
#: scan differently but the predicate is value-identical.
EMB_VALID_SPARK = (
    f"embedding IS NOT NULL AND size(embedding) = {EMB_DIMS}"
    " AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)"
)
EMB_VALID_DUCK = (
    f"embedding IS NOT NULL AND len(embedding) = {EMB_DIMS}"
    " AND len(list_filter(embedding,"
    " x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0"
)


# ---------------------------------------------------------------------------
# Event-time validity window (events.ts / stream ev_time)
# ---------------------------------------------------------------------------

EV_TIME_LO = "2000-01-01 00:00:00"
EV_TIME_HI = "2100-01-01 00:00:00"


def ts_valid_sql(col: str = "ts") -> str:
    """Event-time validity predicate for ``col`` (drops NULL too).

    Identical text is valid Spark SQL and DuckDB SQL; both engines
    compare the wall-clock timestamp against the bound literals, and
    the post-1970 lower edge makes the stream-watermark epoch-0
    initialization unobservable (see module docstring)."""
    return (
        f"{col} >= TIMESTAMP '{EV_TIME_LO}'"
        f" AND {col} < TIMESTAMP '{EV_TIME_HI}'"
    )


def ts_valid(col: str = "ts") -> Column:
    """DataFrame-API twin of ``ts_valid_sql``."""
    return F.expr(ts_valid_sql(col))


#: numpy bounds for splitter-side (Arrow) filtering, microseconds.
EV_TIME_LO_US = 946_684_800_000_000  # 2000-01-01T00:00:00Z
EV_TIME_HI_US = 4_102_444_800_000_000  # 2100-01-01T00:00:00Z


# ---------------------------------------------------------------------------
# Business-date validity window (orders.o_orderdate / lineitem.l_shipdate)
# ---------------------------------------------------------------------------

#: The TPC-H-ish generators emit dates in [1992, 1999); the pipeline's
#: documented operational window is [1990-01-01, 2100-01-01). A NULL
#: or out-of-window date has no position on the business-time axis:
#: engines disagree on NULL placement in ORDER BY/windows (Spark
#: NULLS FIRST, DuckDB NULLS LAST), so a NULL date reaching a
#: time-ordered ROW_NUMBER/frame shifts every downstream rank/frame in
#: one engine only. REQUIRED at every date-ordered sequence builder;
#: BETWEEN-shaped, so it prunes parquet row groups at scale.
TPCH_DATE_LO = "1990-01-01 00:00:00"
TPCH_DATE_HI = "2100-01-01 00:00:00"


def tpch_date_valid_sql(col: str) -> str:
    """Business-date validity predicate (drops NULL too). Identical
    text is valid Spark SQL and DuckDB SQL."""
    return (
        f"{col} >= TIMESTAMP '{TPCH_DATE_LO}'"
        f" AND {col} < TIMESTAMP '{TPCH_DATE_HI}'"
    )


def tpch_date_valid(col: str) -> Column:
    """DataFrame-API twin of ``tpch_date_valid_sql``."""
    return F.expr(tpch_date_valid_sql(col))


# ---------------------------------------------------------------------------
# Text character-class validity (documents.text)
# ---------------------------------------------------------------------------

#: Hostile character class: C0 controls except tab (09) / newline (0A),
#: plus invisible formatting codepoints with no text content whose
#: length/normalization semantics differ across unicode libraries —
#: soft hyphen (AD), zero-width space/joiners (200B-200D), word joiner
#: (2060), BOM/ZWNBSP (FEFF). Same regex source compiles identically
#: under Java regex (Spark rlike) and RE2 (DuckDB regexp_matches).
TEXT_HOSTILE_RE = (
    "[\\x00-\\x08\\x0B-\\x1F\\x{00AD}\\x{200B}-\\x{200D}"
    "\\x{2060}\\x{FEFF}]"
)

#: Row predicate keeping NULL text (the NULL-documents net pins NULL
#: flow separately); a document CONTAINING a hostile char is dropped.
#: DuckDB's plain '' literals keep backslashes literal, so the regex
#: reaches RE2 intact; the Spark side goes through the DataFrame API
#: (no SQL string-literal unescaping) via ``text_valid()``.
TEXT_VALID_DUCK = (
    f"(text IS NULL OR NOT regexp_matches(text, '{TEXT_HOSTILE_RE}'))"
)


def text_valid(col: str = "text") -> Column:
    """DataFrame-API twin of ``TEXT_VALID_DUCK``."""
    return F.col(col).isNull() | ~F.col(col).rlike(TEXT_HOSTILE_RE)

#: Max token length for token-pair operators (``text_bpe_pair_stats``):
#: tokens longer than this are corrupt ingest (no natural language has
#: them) and would mint a linear-in-length pair stream per token.
TEXT_MAX_TOKEN = 512

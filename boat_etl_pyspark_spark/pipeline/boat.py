"""The reference boat-sales ETL, re-expressed Spark-native end-to-end.

The reference (src/pipeline_pyspark.py) cleans a messy CSV with
driver-side pandas row loops, validates with pandera, and only then
hands one aggregate to Spark. Here the whole pipeline is a single
lazy Spark plan: text scan → char cleanup → CSV parse with explicit
schema → column-expression transforms → validation gate →
parquet/summary sinks. No pandas frame ever materializes on the
driver; the only Python in the dataflow is the Arrow-vectorized
line-cleanup UDF, kept solely for byte-exact parity with the
reference's recursive-collapse algorithm (SURVEY.md §7 "hard parts").

Stage map (reference file:line → here):
  S1 raw scan + blank drop   src/pipeline_pyspark.py:192-193 → read_raw_lines
  S2 only_ascii cleanup      src/pipeline_pyspark.py:40-53   → clean_lines
  S3 temp-file + pd.read_csv src/pipeline_pyspark.py:196-199 → parse_csv (from_csv, no temp file)
  P1 Price/Currency split    src/pipeline_pyspark.py:211-213 → transform
  P2 euro() FX map           src/pipeline_pyspark.py:30-36,214
  P3 year sentinel           src/pipeline_pyspark.py:219-224 (current_year injectable)
  P4-P7 location/fills       src/pipeline_pyspark.py:228-259
  P8 Type/Power split        src/pipeline_pyspark.py:247-252
  V1-V9 pandera checks       src/pipeline_pyspark.py:275-308 → validate (aggregated predicates)
  A1+O1 summary              src/pipeline_pyspark.py:352-356 → summarize
  K1/K2 sinks                src/pipeline_pyspark.py:340-362 → write_outputs
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

CSV_COLUMNS = [
    "Price", "Boat Type", "Manufacturer", "Type", "Year Built",
    "Length", "Width", "Material", "Location",
    "Number of views last 7 days",
]

# from_csv schema for the cleaned lines (reference infers via pandas;
# explicit here — SURVEY §1 "never inferred-from-pandas")
_CSV_SCHEMA = (
    "`Price` STRING, `Boat Type` STRING, `Manufacturer` STRING, `Type` STRING, "
    "`Year Built` BIGINT, `Length` DOUBLE, `Width` DOUBLE, `Material` STRING, "
    "`Location` STRING, `Number of views last 7 days` BIGINT"
)

# FX table of euro() (src/pipeline_pyspark.py:35); unknown currency -> NULL
FX_RATES = {"EUR": 1.0, "CHF": 1.06, "DKK": 0.13, "GBP": 1.17}

# Country recode table (data, not code — mirrors the 127-entry
# replace_country mapping at src/pipeline_pyspark.py:56-182 that the
# cleaned output depends on). Lowercased key -> canonical country.
_CANONICAL = [
    "Switzerland", "Germany", "Denmark", "Italy", "France",
    "United Kingdom", "Spain", "Austria", "Netherlands", "Slovenia",
    "Serbia", "Slovakia", "Croatia", "Portugal", "Malta", "Montenegro",
    "Latvia", "Greece", "Poland", "Turkey", "Finland", "Hungary",
    "Cyprus", "Czech Republic", "Sweden", "Lithuania", "United States",
    "Ukraine", "Estonia", "Monaco", "Russia", "Egypt",
    "United Arab Emirates", "Australia", "Bulgaria", "Philippines",
    "Taiwan", "Thailand", "Luxembourg", "Venezuela", "Ireland",
    "Norway", "Seychelles", "Morocco", "Lebanon", "Romania",
]
_VARIANTS = {
    "italien": "Italy", "italie": "Italy", "dalmatien": "Croatia",
    "kroatien krk": "Croatia", "espa?a": "Spain",
}
_PLACES = {
    "steinwiesen": "Germany", "rolle": "Switzerland",
    "baden baden": "Germany", "lake constance": "Germany",
    "split": "Croatia", "lago maggiore": "Italy",
    "brandenburg an derhavel": "Germany", "zevenbergen": "Netherlands",
    "faoug": "Switzerland", "martinique": "France",
    "gibraltar": "United Kingdom", "mallorca": "Spain",
    "opwijk": "Belgium", "isle of man": "United Kingdom",
    "neusiedl am see": "Austria", "bodensee": "Germany",
    "avenches": "Switzerland", "heilbronn": "Germany",
    "z richse, 8855 wangen sz": "Switzerland", "ibiza": "Spain",
    "lommel": "Belgium", "wijdenes": "Netherlands", "bremen": "Germany",
    "bielefeld": "Germany", "porto rotondo": "Italy",
    "berlin wannsee": "Germany", "toscana": "Italy",
    "vierwaldst ttersee - buochs": "Switzerland",
    "juelsminde havn": "Denmark", "barssel": "Germany",
    "welschenrohr": "Switzerland", "thun": "Switzerland",
    "adria": "Italy", "rovinij": "Croatia", "donau": "Germany",
    "travem nde": "Germany", "stralsund": "Germany",
    "rostock": "Germany", "lake geneva": "Switzerland",
    "belgi, zulte": "Belgium", "niederrhein": "Germany",
    "r gen": "Germany", "oder": "Germany", "beilngries": "Germany",
    "marina punat": "Croatia", "french southern territories": "France",
    "brandenburg": "Germany", "nan": "None", "waren m ritz": "Germany",
    "jersey": "United Kingdom",
    "neustadt in holstein (ostsee)": "Germany", "ostsee": "Germany",
    "greetsile/ krummh rn": "Germany", "annecy": "France",
    "izola": "Slovenia", "83278 traunstein": "Germany",
    "novi vinodolski": "Croatia", "lago di garda": "Italy",
    "nordseek ste": "Germany", "24782 b delsdorf": "Germany",
    "pt stkysten ellers esbjerg": "Denmark",
    "calanova mallorca": "Spain", "katwijk": "Netherlands",
    "tenero, lago maggiore": "Switzerland", "fu ach": "Austria",
    "angera": "Italy", "lago maggiore, minusio": "Switzerland",
    "thalwil": "Switzerland", "rheinfelden": "Germany",
}
COUNTRY_RECODE = {c.lower(): c for c in _CANONICAL} | _VARIANTS | _PLACES

MATERIAL_WHITELIST = [
    "Aluminium", "Carbon Fiber", "GRP", "Hypalon", "None", "PVC",
    "Plastic", "Reinforced concrete", "Rubber", "Steel",
    "Thermoplastic", "Wood",
]


def _clean_line(text: str) -> str:
    """Byte-exact port of the reference's only_ascii(special=True)
    (src/pipeline_pyspark.py:40-53): mojibake fixes, non-ASCII→space,
    then the recursive collapse loop whose left-to-right
    non-overlapping replace order is load-bearing for golden parity."""
    x = text.replace("£", "GBP").replace("Â»", "|")
    x = "".join(c if ord(c) < 128 else " " for c in x)
    while True:
        x = x.replace("  ", " ")
        x = x.replace(" ,", ",")
        x = x.replace(' "', '"')
        x = x.replace('" ', '"')
        if "  " not in x:
            break
    return x.strip()


def _clean_series(lines: pd.Series) -> pd.Series:
    return lines.map(_clean_line)


def read_raw_lines(spark: SparkSession, input_path: str) -> DataFrame:
    """S1: raw text scan, dropping blank lines (reference :192-193)."""
    return spark.read.text(input_path).where(
        F.length(F.regexp_replace(F.col("value"), "[\r\n]", "")) > 0
    )


def clean_lines(raw: DataFrame) -> DataFrame:
    """S2: per-line cleanup (Arrow-vectorized for exact parity).

    The pandas_udf is built here rather than at module import: the
    decorator parses its DDL return type through the active session,
    which doesn't exist when a Python worker re-imports this module.
    """
    clean_udf = pandas_udf(_clean_series, "string")
    return raw.select(clean_udf(F.col("value")).alias("line"))


def parse_csv(cleaned: DataFrame) -> DataFrame:
    """S3 without the temp file: reassemble multi-line records, then
    from_csv with an explicit schema.

    The input has records whose quoted fields wrap across physical
    lines (5 in the reference data); pandas' document-level parser
    rejoins them implicitly. Line-wise, a record boundary is where the
    running count of quote chars is even — computed with one ordered
    window PER FILE: multi-line quoted CSV is inherently sequential
    within a file (Spark's own multiLine reader makes files
    non-splittable for the same reason), so the window partitions on
    ``input_file_name()`` and ingest parallelism at scale comes from
    many files. Each file's header row is dropped independently.
    """
    header = ",".join(CSV_COLUMNS)
    quotes = F.length(F.col("line")) - F.length(F.regexp_replace("line", '"', ""))
    w = Window.partitionBy("fname").orderBy("line_id")
    lines = (
        cleaned.withColumn("fname", F.input_file_name())
        .withColumn("line_id", F.monotonically_increasing_id())
        .withColumn("q", quotes)
        .withColumn(
            "parity_before",
            F.coalesce(
                F.sum("q").over(w.rowsBetween(Window.unboundedPreceding, -1)) % 2,
                F.lit(0),
            ),
        )
        .withColumn("starts_record", (F.col("parity_before") == 0).cast("int"))
        .withColumn(
            "record_id",
            F.sum("starts_record").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    records = (
        lines.groupBy("fname", "record_id")
        .agg(F.array_sort(F.collect_list(F.struct("line_id", "line"))).alias("parts"))
        .select(
            F.concat_ws(
                "\n", F.transform(F.col("parts"), lambda x: x["line"])
            ).alias("record")
        )
    )
    return (
        records.where(F.col("record") != header)
        .select(
            F.from_csv(
                F.col("record"), _CSV_SCHEMA, {"quote": '"', "escape": '"'}
            ).alias("r")
        )
        .select("r.*")
    )


def _recode_map() -> Column:
    pairs: list[Column] = []
    for k, v in COUNTRY_RECODE.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def transform(df: DataFrame, current_year: int = 2025) -> DataFrame:
    """P1-P8 as native column expressions (one lazy plan, codegen'd).

    ``current_year`` replaces the reference's wall-clock read
    (src/pipeline_pyspark.py:223) so results are reproducible.
    """
    # P1: Price "CUR 1234" -> Currency + integer Price (:211-213)
    df = (
        df.withColumn("Currency", F.substring_index(F.col("Price"), " ", 1))
        .withColumn(
            "Price",
            F.expr("substring(Price, instr(Price, ' ') + 1)").cast("bigint"),
        )
    )
    # P2: euro() as a literal-map expression — no UDF (:30-36,214)
    fx = F.create_map(*[F.lit(x) for kv in FX_RATES.items() for x in kv])
    df = df.withColumn(
        "Euro", F.col("Price").cast("double") * fx[F.col("Currency")]
    )
    # P3: data-dependent year sentinel (:219-224) — two-pass: scalar
    # min over non-zero years broadcast back into the plan
    yc = F.col("`Year Built`")
    m = (
        df.where(yc != 0)
        .agg(F.min("`Year Built`"))
        .collect()[0][0]
    )
    df = df.withColumn(
        "Year Built",
        F.when((yc >= m) & (yc <= current_year), yc).otherwise(F.lit(m - 10)),
    )
    # P4: Location -> Country / City, rstrip only (:228-231). A row
    # without separator gets NULL City; NULL Location flows to the
    # pandas str-cast 'nan' path below.
    loc = F.col("Location")
    df = (
        df.withColumn("Country", F.rtrim(F.substring_index(loc, "|", 1)))
        .withColumn(
            "City",
            F.when(
                F.instr(loc, "|") > 0,
                F.rtrim(F.expr("substring(Location, instr(Location, '|') + 1)")),
            ),
        )
        .drop("Location")
    )
    # P5+P6: lowercase/trim then 127-entry recode; unmatched values
    # pass through; pandas astype(str) turns NULL into 'nan', which
    # the map sends to 'None' (:233-235)
    country_raw = F.lower(F.trim(F.coalesce(F.col("Country"), F.lit("nan"))))
    recoded = F.coalesce(_recode_map()[country_raw], country_raw)
    df = df.withColumn(
        "Country", F.when(recoded == "nan", "None").otherwise(recoded)
    )
    # P7: sentinel fills (:238-259)
    df = df.na.fill({"Length": 0.0, "Width": 0.0, "Type": "None",
                     "Manufacturer": "None", "Material": "None",
                     "City": "None", "Country": "None"})
    # P8: Type "cond,fuel" -> Type + Power, 'None' when absent (:247-252)
    t = F.col("Type")
    after = F.expr("substring(Type, instr(Type, ',') + 1)")
    df = df.withColumn(
        "Power",
        F.when((F.instr(t, ",") > 0) & (after != ""), after).otherwise("None"),
    ).withColumn("Type", F.substring_index(t, ",", 1))
    return df


def validate(df: DataFrame, current_year: int = 2025) -> DataFrame:
    """V1-V9 as one aggregated predicate scan (reference aborts via
    pandera exceptions, src/pipeline_pyspark.py:275-308; here every
    violation count comes back from a single distributed pass)."""
    checks = {
        "currency_domain": F.col("Currency").isin("CHF", "EUR", "USD", "DKK", "GBP"),
        "year_range": F.col("`Year Built`").between(1800, current_year),
        "length_range": F.col("Length").between(0, 1000),
        "width_range": F.col("Width").between(0, 1000),
        "material_domain": F.col("Material").isin(MATERIAL_WHITELIST),
        "views_range": F.col("`Number of views last 7 days`").between(0, 10**6),
        "manufacturer_notnull": F.col("Manufacturer").isNotNull(),
        "type_notnull": F.col("Type").isNotNull(),
        "power_notnull": F.col("Power").isNotNull(),
    }
    return df.agg(
        *[
            F.sum(F.when(~pred, 1).otherwise(0)).alias(f"bad_{name}")
            for name, pred in checks.items()
        ]
    )


def assert_valid(df: DataFrame, current_year: int = 2025) -> None:
    row = validate(df, current_year).collect()[0]
    bad = {k: v for k, v in row.asDict().items() if v}
    if bad:
        raise ValueError(f"validation failed: {bad}")


def finalize(df: DataFrame) -> DataFrame:
    """P9 renames + golden column order (src/pipeline_pyspark.py:336)."""
    df = df.withColumnsRenamed({"Euro": "price_eur", "Country": "country"})
    order = [
        "Price", "Boat Type", "Manufacturer", "Type", "Year Built",
        "Length", "Width", "Material", "Number of views last 7 days",
        "Currency", "price_eur", "country", "City", "Power",
    ]
    return df.select(*[f"`{c}`" for c in order])


def summarize(df: DataFrame) -> DataFrame:
    """A1+O1: the reference's one distributed query (:352-356)."""
    return (
        df.groupBy("country")
        .agg(F.avg("price_eur").alias("avg_price"), F.count("*").alias("count"))
        .orderBy(F.desc("avg_price"))
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    parquet_out: str | None = None,
    summary_out: str | None = None,
    current_year: int = 2025,
) -> DataFrame:
    """Full E1 lifecycle as one Spark job graph; returns the final frame."""
    df = parse_csv(clean_lines(read_raw_lines(spark, input_path)))
    df = transform(df, current_year)
    assert_valid(df, current_year)
    out = finalize(df)
    # dir-valued outputs get default file names appended, matching the
    # reference CLI contract (src/pipeline_pyspark.py:341-343,348-350)
    if parquet_out and os.path.isdir(parquet_out):
        parquet_out = os.path.join(parquet_out, "data.parquet")
    if summary_out and os.path.isdir(summary_out):
        summary_out = os.path.join(summary_out, "data_summary.csv")
    if parquet_out:
        out.write.mode("overwrite").parquet(parquet_out)
    if summary_out:
        # bounded summary (≤ #countries rows): driver collect is the
        # right tool, same as the reference's K2 — and it reproduces
        # pandas float repr in the CSV
        os.makedirs(os.path.dirname(summary_out) or ".", exist_ok=True)
        summarize(out).toPandas().to_csv(summary_out, index=False)
    return out


def main() -> None:
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser(description="Spark-native boat-sales ETL")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True, help="parquet output path")
    p.add_argument("-s", "--summary", required=True, help="summary CSV path")
    p.add_argument("--current-year", type=int, default=2025)
    p.add_argument(
        "--no-spark",
        action="store_true",
        help="dry run, reference-CLI compatible (src/pipeline_pyspark.py:383-384):"
        " clean + transform + validate only, write no outputs; exit status"
        " reports validity. (This engine still uses a local Spark session"
        " for the validation pass — 'no-spark' keeps the reference's"
        " observable contract, not its implementation.)",
    )
    args = p.parse_args()
    spark = get_spark("boat-etl")
    try:
        if args.no_spark:
            df = transform(
                parse_csv(clean_lines(read_raw_lines(spark, args.input))),
                args.current_year,
            )
            assert_valid(df, args.current_year)
        else:
            run_pipeline(
                spark, args.input, args.output, args.summary, args.current_year
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

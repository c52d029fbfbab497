"""Sources & sinks: labeled-pairs CSV, spec-JSON records, splits, pair sinks.

Re-expressions of the reference's IO layer (SURVEY.md §2.1):

- read_labeled_pairs ↔ readCSV (src/functs.c:539-675): header drop,
  malformed-row skip, unresolvable-id drop (the `failed` counter).
- seeded_shuffle_split ↔ shuffleCSV + fractional byte split
  (src/functs.c:491-537 + src/main.c:33-34): the reference shells out to
  unseeded `shuf` (nondeterministic!); here a SEEDED rand order, then
  row_number range split 60/20/20 — deterministic by design.
- read_spec_json ↔ readDataset/readFile (src/functs.c:33-489): JSON
  records → MAP<STRING, ARRAY<STRING>> properties.
- write_matches/write_negatives ↔ extractMatches/extractNegatives sinks
  (src/myMatches.c:255-405).
- read_iceberg: catalog-gated Iceberg reader (jars absent in this image →
  clean error; parquet fallback covers tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LABELED_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("left_spec_id", T.StringType()),
        T.StructField("right_spec_id", T.StringType()),
        T.StructField("label", T.StringType()),  # parsed/validated below
    ]
)


def read_labeled_pairs(
    spark: SparkSession,
    path: str,
    records: DataFrame | None = None,
    id_col: str = "spec_id",
) -> DataFrame:
    """CSV (left, right, label) with reference drop semantics:

    - header row dropped (header=True ↔ src/functs.c:504-516)
    - label must be exactly '1' or '0'; anything else skipped
      (src/functs.c:607-653)
    - rows whose ids don't resolve against `records` are dropped — the
      reference's `failed` counter path (src/functs.c:616-621), here two
      left-semi joins.
    """
    raw = spark.read.csv(path, header=True, schema=LABELED_PAIRS_SCHEMA)
    pairs = (
        raw.filter(F.col("label").isin("1", "0"))
        .filter(F.col("left_spec_id").isNotNull() & F.col("right_spec_id").isNotNull())
        .select("left_spec_id", "right_spec_id", F.col("label").cast("int").alias("label"))
    )
    if records is not None:
        ids = records.select(F.col(id_col))
        pairs = pairs.join(
            ids.withColumnRenamed(id_col, "left_spec_id"), "left_spec_id", "left_semi"
        ).join(ids.withColumnRenamed(id_col, "right_spec_id"), "right_spec_id", "left_semi")
    return pairs


def seeded_shuffle_split(
    pairs: DataFrame,
    weights: tuple[float, float, float] = (0.6, 0.2, 0.2),
    seed: int = 42,
) -> DataFrame:
    """Adds a `split` column ∈ {train, test, val} by seeded shuffle order.

    Mirrors shuffleCSV + TRAIN_PERC/TEST_PERC byte-offset split
    (src/functs.c:491-537, src/main.c:296-308) but deterministic: the
    reference uses system `shuf` unseeded (SURVEY.md §4.2 determinism
    hazard — deliberately fixed).

    NOTE: exact-count split needs a global row_number → single-partition
    window. Fine for label relations (≪ corpus size); for label sets in
    the billions use :func:`hash_split` (fully parallel, ratios
    approximate)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.rand(seed), *pairs.columns)
    ranked = pairs.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    train_cut = F.col("_n") * weights[0]
    test_cut = F.col("_n") * (weights[0] + weights[1])
    return ranked.withColumn(
        "split",
        F.when(F.col("_r") <= train_cut, "train")
        .when(F.col("_r") <= test_cut, "test")
        .otherwise("val"),
    ).drop("_r", "_n")


def hash_split(
    pairs: DataFrame,
    weights: tuple[float, float, float] = (0.6, 0.2, 0.2),
    seed: int = 42,
) -> DataFrame:
    """Scale-path split: deterministic per-row hash bucket — no window, no
    shuffle, embarrassingly parallel. Ratios are approximate (law of
    large numbers), assignment is stable across runs and partitionings."""
    b = F.pmod(F.xxhash64(*pairs.columns, F.lit(seed)), F.lit(10_000))
    train_cut = int(10_000 * weights[0])
    test_cut = int(10_000 * (weights[0] + weights[1]))
    return pairs.withColumn(
        "split",
        F.when(b < train_cut, "train").when(b < test_cut, "test").otherwise("val"),
    )


def claim_records_for_sets(
    requests: DataFrame,
    records: DataFrame | None = None,
    id_col: str = "spec_id",
    set_col: str = "set",
) -> DataFrame:
    """Visited-flag per-set claim filter (findRecord_forSet,
    src/myHash.c:255-309): each record is handed out AT MOST ONCE per
    set, and only if it exists in the record store.

    The reference walks requests sequentially, mutating a visited flag
    ('n' → 't' → 'v'; the validation set may also claim records the test
    set already took, and sets are built test-then-val so the 'v'-blocks-
    't' branch never fires). The order-free re-expression: one distinct
    per (id, set) + a left-semi existence probe — same claim sets, no
    mutable driver state, shuffle only on the (small) request relation.
    """
    claims = requests.select(F.col(id_col), F.col(set_col)).dropDuplicates(
        [id_col, set_col]
    )
    if records is not None:
        claims = claims.join(records.select(F.col(id_col)), id_col, "left_semi")
    return claims


def read_spec_json(spark: SparkSession, path: str) -> DataFrame:
    """Spec-JSON records → (spec_id, properties MAP<STRING, ARRAY<STRING>>).

    The reference hand-parses `"key": "value"` / `"key": ["v1", ...]`
    JSON files one per spec (src/functs.c:163-489) and composes
    specID = "<site>//<file>" from the directory layout
    (src/functs.c:111-117). Here: spark.read.json with provenance from
    input_file_name(); scalar-or-array values normalized to arrays.
    """
    raw = spark.read.option("primitivesAsString", "true").json(path)
    cols = [c for c in raw.columns if not c.startswith("_")]
    entries = []
    for c in cols:
        dt = dict(raw.dtypes)[c]
        vals = F.col(c) if dt.startswith("array") else F.array(F.col(c))
        vals = F.filter(vals.cast("array<string>"), lambda v: v.isNotNull())
        entries.append(F.struct(F.lit(c).alias("key"), vals.alias("value")))
    props = F.map_from_entries(
        F.filter(F.array(*entries), lambda e: F.size(e["value"]) > 0)
    )
    site = F.element_at(F.split(F.input_file_name(), "/"), -2)
    fname = F.regexp_replace(F.element_at(F.split(F.input_file_name(), "/"), -1), r"\.json$", "")
    return raw.select(
        F.concat_ws("//", site, fname).alias("spec_id"), props.alias("properties")
    )


def spec_properties_tokens(specs: DataFrame) -> DataFrame:
    """(spec_id, token) from a MAP<STRING,ARRAY<STRING>> properties column —
    the reference tokenizes KEYS and VALUES alike (spec_to_bow,
    src/boWords.c:202-226)."""
    from bigdataentityresolution_spark.functions.text import admitted_tokens

    kv_text = F.concat_ws(
        " ",
        F.concat_ws(" ", F.map_keys("properties")),
        F.concat_ws(" ", F.flatten(F.map_values("properties"))),
    )
    return specs.select(
        "spec_id", F.explode(admitted_tokens(kv_text)).alias("token")
    )


def write_matches(labels: DataFrame, path: str) -> None:
    """Positives sink (extractMatches, src/myMatches.c:255-330):
    within-cluster pairs as CSV `left,right,label=1`."""
    from bigdataentityresolution_spark.operators.clustering import extract_matches

    extract_matches(labels).orderBy("a", "b").write.mode("overwrite").option(
        "header", True
    ).csv(path)


def write_negatives(labels: DataFrame, neg_cluster_edges: DataFrame, path: str) -> None:
    """Negatives sink (extractNegatives, src/myMatches.c:332-405)."""
    from bigdataentityresolution_spark.operators.clustering import extract_negatives

    extract_negatives(labels, neg_cluster_edges).orderBy("a", "b").write.mode(
        "overwrite"
    ).option("header", True).csv(path)


def write_model(model, path: str) -> None:
    """Model sink (logistic_extract, src/logistic.c:625-665) as JSON —
    also the resume format for the driver-held LR state."""
    import json
    from dataclasses import asdict

    with open(path, "w") as f:
        json.dump(asdict(model), f, indent=2)


def read_model(path: str):
    import json

    from bigdataentityresolution_spark.operators.scoring import LRModel

    with open(path) as f:
        d = json.load(f)
    d["weights"] = tuple(d["weights"])
    return LRModel(**d)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg source for the 10^12-file production table.

    Needs the iceberg-spark-runtime jar + catalog conf (absent in this
    image); raises a clear error instead of failing obscurely. Tests use
    the parquet path; the DataFrame lineage downstream is identical.
    """
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # jar missing → AnalysisException
        raise RuntimeError(
            "Iceberg reader unavailable: add org.apache.iceberg:iceberg-spark-runtime "
            "to spark.jars.packages and configure a catalog "
            "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog). "
            f"Underlying error: {e}"
        ) from e

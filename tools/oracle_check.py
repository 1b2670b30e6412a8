"""Standalone DuckDB oracle check over a graft.Verify dump — the tool behind
ORACLE_SF01.json (the recorded full-scale sf0.1 correctness pass).

Usage:  python3 tools/oracle_check.py <sfDir> <verifyOutDir> <artifact.json>

Replicates the driver's per-query compare: run each SparkEntry.oracleSql
query in DuckDB over the raw parquet tables, read the Spark result parquet
from the Verify dump, and compare (row count, sorted column-name schema,
and a canonical value hash: columns sorted by name, floats at 9 significant
digits, rows sorted lexicographically, sha256). Both sides run through the
same canonicalizer, so the digest compares values, not encodings.

Dev-harness tool only (duckdb/python are the ORACLE side, per the brief);
the shipped library is pure Scala/Spark and does not depend on this.

--fast rewrites the three document-quadratic oracles' brute-force exact-
Jaccard pair subquery into a mathematically identical inverted-index form
(pairs grouped by shared shingle; |A∪B| = |A|+|B|-|A∩B| on distinct sets;
pairs sharing zero shingles have jaccard 0 < 0.8 and are droppable). The
literal form runs DuckDB's inequality nested-loop single-threaded — hours
at sf0.1 — while the rewrite is an equi-join + group-by, ~90 s.
--validate-rewrite runs BOTH forms and compares their digests (do this at
sf0.01 where the literal form is feasible; recorded in the artifact).
"""
import duckdb, json, sys, hashlib, math, glob, datetime, decimal, time, os

FAST = "--fast" in sys.argv
VALIDATE = "--validate-rewrite" in sys.argv
argv = [a for a in sys.argv if not a.startswith("--")]
sf_dir, out_dir, artifact = argv[1], argv[2], argv[3]

# The literal brute-force pair subquery as registered in SparkEntry.oracleSql
# (near_dup_pairs is exactly this; near_dedup_corpus / near_dup_clusters
# embed it as their `nd` CTE). Replacement is exact-substring so any drift in
# the registered SQL fails loudly instead of silently diverging.
PAIRS_LITERAL = (
  "WITH sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, "
  "greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s "
  "FROM documents) SELECT a_doc_id, b_doc_id, jaccard FROM (SELECT a.doc_id AS "
  "a_doc_id, b.doc_id AS b_doc_id, round(len(list_intersect(a.s, b.s))::DOUBLE "
  "/ len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard FROM sh a JOIN "
  "sh b ON a.doc_id < b.doc_id WHERE len(a.s) > 0 AND len(b.s) > 0) "
  "WHERE jaccard >= 0.8")
PAIRS_FAST = (
  "WITH sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, "
  "greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s "
  "FROM documents), sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0), "
  "ex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0), "
  "cm AS (SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, count(*) AS c "
  "FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
  "SELECT a_doc_id, b_doc_id, round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard "
  "FROM cm JOIN sz sa ON sa.doc_id = cm.a_doc_id JOIN sz sb ON sb.doc_id = cm.b_doc_id "
  "WHERE round(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.8")
# Same rewrite for the incremental (batch-vs-standing-corpus) twin: identical
# shingle sets, the pair space restricted to batch×corpus instead of a<b.
INCR_LITERAL = (
  "WITH sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, "
  "greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s "
  "FROM documents) SELECT new_doc_id, dup_of_doc_id, jaccard FROM (SELECT "
  "a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, "
  "round(len(list_intersect(a.s, b.s))::DOUBLE "
  "/ len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard FROM sh a JOIN "
  "sh b ON a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0 "
  "WHERE len(a.s) > 0 AND len(b.s) > 0) "
  "WHERE jaccard >= 0.8")
INCR_FAST = (
  "WITH sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, "
  "greatest(len(coalesce(text,''))-4, 0)), i -> coalesce(text,'')[i:i+4])) AS s "
  "FROM documents), sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0), "
  "ex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0), "
  "cm AS (SELECT a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, count(*) AS c "
  "FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0 GROUP BY 1, 2) "
  "SELECT new_doc_id, dup_of_doc_id, round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard "
  "FROM cm JOIN sz sa ON sa.doc_id = cm.dup_of_doc_id JOIN sz sb ON sb.doc_id = cm.new_doc_id "
  "WHERE round(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.8")
# ingested_corpus embeds the SAME brute-force pair shape twice over a shared
# `sh` CTE — batch-within-batch (ndb) and standing-vs-batch (nds) — so its
# rewrites replace the inner SELECT bodies and inline their own derived
# tables (the sh CTE stays defined by the outer WITH).
INGEST_NDB_LITERAL = (
  "SELECT a_doc_id, b_doc_id, jaccard FROM (SELECT a.doc_id AS a_doc_id, "
  "b.doc_id AS b_doc_id, round(len(list_intersect(a.s, b.s))::DOUBLE "
  "/ len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard FROM sh a JOIN "
  "sh b ON a.doc_id < b.doc_id AND a.doc_id % 10 = 1 AND b.doc_id % 10 = 1 "
  "WHERE len(a.s) > 0 AND len(b.s) > 0) WHERE jaccard >= 0.8")
INGEST_NDB_FAST = (
  "SELECT a_doc_id, b_doc_id, round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard "
  "FROM (SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id, count(*) AS c "
  "FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0 AND doc_id % 10 = 1) a "
  "JOIN (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0 AND doc_id % 10 = 1) b "
  "ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) cm "
  "JOIN (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0) sa ON sa.doc_id = cm.a_doc_id "
  "JOIN (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0) sb ON sb.doc_id = cm.b_doc_id "
  "WHERE round(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.8")
INGEST_NDS_LITERAL = (
  "SELECT new_doc_id, dup_of_doc_id, jaccard FROM (SELECT "
  "a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, "
  "round(len(list_intersect(a.s, b.s))::DOUBLE "
  "/ len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard FROM sh a JOIN "
  "sh b ON a.doc_id % 10 NOT IN (0, 1) AND b.doc_id % 10 = 1 "
  "WHERE len(a.s) > 0 AND len(b.s) > 0) WHERE jaccard >= 0.8")
INGEST_NDS_FAST = (
  "SELECT new_doc_id, dup_of_doc_id, round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard "
  "FROM (SELECT a.doc_id AS dup_of_doc_id, b.doc_id AS new_doc_id, count(*) AS c "
  "FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0 AND doc_id % 10 NOT IN (0, 1)) a "
  "JOIN (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0 AND doc_id % 10 = 1) b "
  "ON a.g = b.g GROUP BY 1, 2) cm "
  "JOIN (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0) sa ON sa.doc_id = cm.dup_of_doc_id "
  "JOIN (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0) sb ON sb.doc_id = cm.new_doc_id "
  "WHERE round(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.8")
REWRITES = {
  "near_dup_pairs": [(PAIRS_LITERAL, PAIRS_FAST)],
  "near_dedup_corpus": [(PAIRS_LITERAL, PAIRS_FAST)],
  "near_dup_clusters": [(PAIRS_LITERAL, PAIRS_FAST)],
  "decontaminated_corpus": [(PAIRS_LITERAL, PAIRS_FAST)],
  # the composed release chain embeds the same literal pair subquery as its
  # (MATERIALIZED) nd CTE — substring replace reaches inside the wrapper
  "trimmed_release_corpus": [(PAIRS_LITERAL, PAIRS_FAST)],
  "incremental_near_dup": [(INCR_LITERAL, INCR_FAST)],
  "incremental_near_dup_indexed": [(INCR_LITERAL, INCR_FAST)],
  "ingested_corpus": [(INGEST_NDB_LITERAL, INGEST_NDB_FAST),
                      (INGEST_NDS_LITERAL, INGEST_NDS_FAST)],
  # round-9 compositions that embed the same literal pair subquery: the
  # release-decision audit and the cross-source mirror matrix
  "doc_curation_decisions": [(PAIRS_LITERAL, PAIRS_FAST)],
  "cross_source_dup_matrix": [(PAIRS_LITERAL, PAIRS_FAST)],
  # round-9 session-2 compositions over the same nd CTE: the tier matrix
  # and the keep-best-quality policy (+ its shippable corpus form)
  "dedup_tier_overlap": [(PAIRS_LITERAL, PAIRS_FAST)],
  "quality_keep_dedup": [(PAIRS_LITERAL, PAIRS_FAST)],
  "quality_keep_corpus": [(PAIRS_LITERAL, PAIRS_FAST)],
}
REWRITABLE = set(REWRITES)

def rewrite(sql, name):
    for literal, fast in REWRITES[name]:
        assert literal in sql, f"registered oracle SQL for {name} drifted from its literal form"
        sql = sql.replace(literal, fast)
    return sql
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == int(v) and abs(v) < 1e15: return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool): return "true" if v else "false"
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, decimal.Decimal): return canon(float(v))
    if isinstance(v, (bytes, bytearray)): return v.hex()
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict): return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

# cheap-first ordering: quadratic document/embedding oracles go last
expensive = ["simhash_near_dup","embedding_near_dup","embedding_dup_clusters",
             "incremental_embedding_near_dup","cosine_topk",
             "near_dup_pairs","near_dedup_corpus","near_dup_clusters",
             "incremental_near_dup","incremental_near_dup_indexed",
             "decontaminated_corpus","ingested_corpus"]
names = [n for n in sorted(oracle) if n not in expensive] + \
        [n for n in expensive if n in oracle]

def run_digest(sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]; rows = res.fetchall()
    return cols, rows, table_digest(cols, rows)

if VALIDATE:
    # rewrite-equivalence check: literal vs inverted-index digests must agree
    ok = True
    for name in sorted(REWRITABLE & set(oracle)):
        t0 = time.time()
        _, lrows, ldig = run_digest(oracle[name])
        tl = time.time() - t0; t0 = time.time()
        _, frows, fdig = run_digest(rewrite(oracle[name], name))
        tf = time.time() - t0
        same = ldig == fdig
        ok &= same
        print(f"{name}: literal {len(lrows)} rows {tl:.1f}s | fast {len(frows)} rows "
              f"{tf:.1f}s | digests_equal={same}", flush=True)
    sys.exit(0 if ok else 1)

results = {}
if os.path.exists(artifact):
    results = json.load(open(artifact))
for name in names:
    # resume skips only entries that PASSED: a recorded hash mismatch (err
    # None, hash_match False) must be re-checked after a fix, or the final
    # count reports stale failures as permanent
    prev = results.get(name)
    if prev and prev.get("err") is None and prev.get("hash_match") is True:
        continue
    sql = oracle[name]
    variant = "literal"
    if FAST and name in REWRITABLE:
        sql = rewrite(sql, name); variant = "inverted_index_rewrite"
    entry = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None,
             "oracle_sec": None, "oracle_variant": variant}
    t0 = time.time()
    try:
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            entry["err"] = "no_spark_output"
        else:
            sres = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')")
            scols = [d[0] for d in sres.description]; srows = sres.fetchall()
            ocols, orows, odig = run_digest(sql)
            entry["spark_rows"], entry["oracle_rows"] = len(srows), len(orows)
            entry["rows_match"] = len(srows) == len(orows)
            entry["schema_match"] = sorted(scols) == sorted(ocols)
            entry["hash_match"] = (entry["rows_match"] and entry["schema_match"] and
                                   table_digest(scols, srows) == odig)
    except Exception as e:
        entry["err"] = f"{type(e).__name__}: {e}"
    entry["oracle_sec"] = round(time.time() - t0, 1)
    results[name] = entry
    json.dump(results, open(artifact, "w"), indent=2, sort_keys=True)
    print(f"[{entry['oracle_sec']:>8.1f}s] {name}: hash_match={entry['hash_match']} err={entry['err']}", flush=True)

n_ok = sum(1 for r in results.values() if r["hash_match"])
print(f"DONE hash-green {n_ok}/{len(results)}")

"""Empirical scaling probe: measure how the graded operator plans grow
with corpus size, fitting a log-log slope (the scaling exponent) per
query over 1x/2x/4x/8x replicas of the sf0.1 fixtures.

This is the measured half of the 100 TB design argument: every graded
plan CLAIMS bounded fan-out (bucketed pair generation, vocabulary-level
joins, shard-local packing), and an exponent near 1.0 across an 8x
spread is the evidence the claim survives scale-up — a hidden quadratic
reads as slope ~2 long before it OOMs a cluster.

Replica construction (deterministic, no RNG):
- documents: doc_id shifted by replica*stride; a per-replica suffix
  token is appended to text so exact/near-dup DISTRIBUTIONS stay
  realistic (a pure copy would make every doc an exact duplicate and
  collapse the dedup work being measured).
- embeddings: vec_id shifted, vectors copied (LSH bucket sizes then
  grow linearly — the stress the bucket join must absorb).
- part: p_partkey shifted, a replica token appended to p_name (the
  name VOCABULARY grows linearly — exactly the claim behind the
  vocabulary-level ER blocking design).
- all other tables symlinked from the base scale (the probed queries
  never read them).

Usage: python tools/scale_probe.py [base_sf_dir] [out_json]
Writes one JSON object with per-query {scale: sec} plus fitted slope.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from priority_data_pipeline_azure_sql_db_spark import queries as _qmod  # noqa: E402
from priority_data_pipeline_azure_sql_db_spark.queries import QUERIES  # noqa: E402
from priority_data_pipeline_azure_sql_db_spark.session import get_spark  # noqa: E402


def _resolve(name: str):
    """Registry entry, else the importable module function — registry-
    RETIRED probes (dedup_minhash_lsh, r13) keep their scaling series."""
    return QUERIES.get(name) or getattr(_qmod, name)

SCALES = [1, 2, 4, 8]
# the negative control runs further out: its quadratic pair term only
# starts dominating fixed overhead past ~8x at this base size, and the
# point of the control is to SHOW the rising slope a capped plan lacks
CONTROL_SCALES = {"dedup_ngram_jaccard": [1, 2, 4, 8, 16, 32]}
# query -> tables it reads (only these are replicated; rest symlink)
PROBES = {
    "dedup_exact_docs": ["documents"],
    "dedup_fingerprint_docs": ["documents"],
    "dedup_minhash_lsh": ["documents"],
    "dedup_jaccard_pairs_capped": ["documents"],
    "text_bpe_tokens_arrow": ["documents"],
    "pack_greedy_sequences": ["documents"],
    "er_first_token_pairs": ["part"],
    "ann_cosine_topk_lsh": ["embeddings"],
    # round 13: the HTML ingest map stage — spread + Arrow parser
    # kernel; the claim is embarrassingly-parallel linearity (slope ~1
    # is CORRECT here: the work IS the corpus, unlike the bounded-
    # fan-out joins above whose claim is sub-linear growth)
    "text_html_extract": ["documents"],
    # round 14: the winnow fingerprint path changed (explode_outer
    # killed the scan-side inferred-filter regexp) — per the published
    # discipline its scaling series re-enters the probe; one shuffle,
    # per-doc window+distinct clustered on the id (slope ~1 correct,
    # same class as html_extract)
    "text_winnow_fingerprints": ["documents"],
    # round 16 (VERDICT r15 ask #3): the DSIR family's measured half.
    # sample_dsir_weights is two hash-agg tokenize passes (target +
    # scored corpus) joined through a <=n_buckets-row BROADCAST ratio
    # table — the claim is map-side-combinable linearity (slope ~1
    # correct, the html_extract class, NOT the sub-linear capped-join
    # class). pipeline_curation_dsir chains the scored-only half into
    # the one-plan curation capstone (dsir gate → linify → boilerplate
    # → quantile → source cap) — same linearity claim, plus evidence
    # the broadcast does not silently become a shuffle as the corpus
    # grows (a jump in the last step would say otherwise).
    "sample_dsir_weights": ["documents"],
    "pipeline_curation_dsir": ["documents"],
    # NEGATIVE CONTROL: the uncapped shingle join's pair term grows
    # quadratically when replicas share shingles (every cross-replica
    # doc pair that shares one multiplies by k^2) — the probe must read
    # a slope WELL above 1 here, proving small-scale overhead cannot
    # mask a real quadratic in the graded (capped) plans above
    "dedup_ngram_jaccard": ["documents"],
}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# id strides larger than any base id so shifted replicas never collide
STRIDE = {"documents": 1_000_000, "embeddings": 1_000_000, "part": 10_000_000}


def build_replica(base: str, k: int, root: str) -> str:
    out = os.path.join(root, f"x{k}")
    if os.path.exists(os.path.join(out, "_READY")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    needed = {t for tables in PROBES.values() for t in tables}
    for t in ALL_TABLES:
        src = f"{base}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t not in needed:
            os.symlink(os.path.abspath(src), dst)
            continue
        parts = []
        for r in range(k):
            if t == "documents":
                parts.append(
                    f"SELECT doc_id + {r * STRIDE[t]} AS doc_id,"
                    f" text || ' rep{r}tok' AS text, lang, source, n_chars "
                    f"FROM read_parquet('{src}')"
                )
            elif t == "embeddings":
                parts.append(
                    f"SELECT vec_id + {r * STRIDE[t]} AS vec_id, embedding,"
                    " label "
                    f"FROM read_parquet('{src}')"
                )
            else:  # part
                parts.append(
                    f"SELECT p_partkey + {r * STRIDE[t]} AS p_partkey,"
                    f" p_name || ' rep{r}tok' AS p_name,"
                    " p_brand, p_type, p_size, p_retailprice "
                    f"FROM read_parquet('{src}')"
                )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)"
        )
    open(os.path.join(out, "_READY"), "w").close()
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe.json"
    root = "/tmp/spark_graft_scale_probe"
    os.makedirs(root, exist_ok=True)
    all_scales = sorted({k for s in CONTROL_SCALES.values() for k in s}
                        | set(SCALES))
    dirs = {k: build_replica(base, k, root) for k in all_scales}
    print(f"[probe] replicas ready under {root}", file=sys.stderr)

    # AQE off + plan-once/execute-hot, the bench.py measurement stance
    spark = get_spark("scale-probe",
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.range(1).count()
    results: dict[str, dict] = {}
    for name in PROBES:
        scales = CONTROL_SCALES.get(name, SCALES)
        per_scale: dict[str, float] = {}
        for k in scales:
            df = _resolve(name)(spark, dirs[k])
            best = math.inf
            for attempt in range(4):
                spark.catalog.clearCache()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if attempt:  # first run = JIT, never counted
                    best = min(best, dt)
            per_scale[str(k)] = round(best, 3)
            print(f"[probe] {name} x{k}: {best:.3f}s", file=sys.stderr)
        # global log-log least-squares slope + per-doubling local slopes
        # (the LAST step is where asymptotics show; the global fit mixes
        # in overhead-dominated small scales)
        xs = [math.log(k) for k in scales]
        ys = [math.log(max(per_scale[str(k)], 1e-3)) for k in scales]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) \
            / sum((x - mx) ** 2 for x in xs)
        steps = [
            round(math.log2(per_scale[str(b)] / per_scale[str(a)]), 2)
            for a, b in zip(scales, scales[1:])
        ]
        results[name] = {"sec": per_scale, "slope": round(slope, 2),
                         "step_slopes": steps}
        print(f"[probe] {name}: slope {slope:.2f} steps {steps}",
              file=sys.stderr)
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

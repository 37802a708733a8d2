"""Micro A/B: median runtime of suspect queries using the code at a given repo path."""
import json, os, statistics, sys, time

repo = sys.argv[1]
sys.path.insert(0, repo)
os.chdir(repo)
from ethereum_analytical_db_spark.plans.registry import all_queries
from ethereum_analytical_db_spark.session import get_spark

QUERIES = ["minhash_lsh_candidates", "dedup_components", "simhash_near_duplicates",
           "gas_price_model_eval", "lm_perplexity_quality"]
spark = get_spark(app_name="micro_ab", cpus=32)
qs = all_queries()
sf = "/root/testdata/sf0.1"
out = {}
for name in QUERIES:
    qs[name].build(spark, sf).toPandas()  # warm
    ts = []
    for _ in range(5):
        t = time.time(); qs[name].build(spark, sf).toPandas(); ts.append(time.time()-t)
    out[name] = round(statistics.median(sorted(ts)[:4]), 3)
out["_total"] = round(sum(v for k,v in out.items() if not k.startswith('_')), 3)
out["_load"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))

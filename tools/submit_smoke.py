"""spark-submit smoke job: proves the engine runs from the --py-files zip.

    python tools/package.py
    spark-submit --master local[8] --py-files dist/pwsc_spark.zip \
        tools/submit_smoke.py [sf_dir]

Runs the flagship crawl slice (synthesize pages → vectorized extraction →
canonical per-host manifest) plus one JVM-side and one pandas-UDF registry
query, and prints a single JSON line. Imports must resolve from the zip —
the job asserts the package loaded from a py-files path when one is set.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("pwsc-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import python_web_scraper_cleaner_spark as pkg
    from python_web_scraper_cleaner_spark.plans.queries import registry

    reg = registry()
    manifest = reg["a1_manifest_counts"][0](spark, sf_dir).collect()
    crawl = reg["crawl_clean_extract"][0](spark, sf_dir).collect()

    print(json.dumps({
        "pkg_loaded_from": pkg.__file__,
        "manifest_rows": len(manifest),
        "crawl_langs": {r["lang"]: r["n_ok"] for r in crawl},
        "ok": len(manifest) > 0 and len(crawl) > 0,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

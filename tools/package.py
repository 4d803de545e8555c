"""Build the --py-files artifact: dist/pwsc_spark.zip.

north_rule: "run via spark-submit --py-files on a multi-executor cluster".
The engine is pure Python (no JVM code, no custom Catalyst), so the whole
deployable is one zip of the package. Usage:

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/pwsc_spark.zip \
        tools/submit_smoke.py
"""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "python_web_scraper_cleaner_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "pwsc_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in sorted(os.walk(
                os.path.join(ROOT, PKG))):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())

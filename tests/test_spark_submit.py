"""North-rule shippability: the whole engine runs via
``spark-submit --py-files engine.zip`` with the repo NOT on any path —
driver and executor Python workers both import the package from the
shipped zip (BASELINE.json north_star: "ships via spark-submit
--py-files"; SURVEY §7.10).
"""

import os
import shutil
import subprocess
import zipfile

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import json
from pyspark.sql import SparkSession

# plain builder on purpose: the package must come from --py-files alone
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

site = fixtures.generate_site(n_pages=25, big_text_pages=0)
pages = fixtures.pages_rows_to_spark(spark, site.rows)
res = CrawlEngine(spark, pages, mode="client").run(
    [CrawlJob("ship", site.seeds[0], max_urls=3)]
)
rows = res.crawled.orderBy("fetch_ord").collect()
print("RESULT:" + json.dumps(
    [(r.url, int(r.fetch_ord), bool(r.success)) for r in rows]
))
spark.stop()
"""


def _build_engine_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "website_to_agent_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):  # pragma: no cover
        import pytest

        pytest.skip("spark-submit not available")
    zip_path = str(tmp_path / "engine.zip")
    _build_engine_zip(zip_path)
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         str(script)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert proc.returncode == 0 and lines, (
        proc.stdout[-1500:] + "\n---\n" + proc.stderr[-3000:]
    )
    import json

    rows = json.loads(lines[-1][len("RESULT:"):])
    ok = [r for r in rows if r[2]]
    assert len(ok) == 3
    assert rows[0][0].endswith("/p/0.html") and rows[0][1] == 0

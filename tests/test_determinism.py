"""SURVEY §5.2.5 / R2: identical ordered crawl output under different
parallelism (local[2] vs local[4]) and shuffle-partition counts.

Each configuration runs in its own subprocess (a Spark master can't
change within a session); outputs are compared byte-for-byte.
"""

import json
import subprocess
import sys

_SCRIPT = r"""
import hashlib, json, sys
sys.path.insert(0, "/root/repo")
from website_to_agent_spark import fixtures
from website_to_agent_spark.session import get_spark
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

cores, parts = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"det{cores}", cores=cores, shuffle_partitions=parts)
site = fixtures.generate_site(n_pages=40, big_text_pages=0)
pages = fixtures.pages_rows_to_spark(spark, site.rows)
res = CrawlEngine(spark, pages, mode="client").run(
    [CrawlJob("d", site.seeds[0], max_urls=7)]
)
rows = res.crawled.orderBy("fetch_ord").collect()
out = [
    (r.url, int(r.fetch_ord), bool(r.success),
     hashlib.sha256((r.text or "").encode()).hexdigest(),
     hashlib.sha256((r.content or "").encode()).hexdigest())
    for r in rows
]
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def _run(cores: int, parts: int):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(cores), str(parts)],
        capture_output=True, text=True, timeout=600,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert lines, proc.stderr[-2000:]
    return json.loads(lines[-1][len("RESULT:"):])


def test_identical_output_across_parallelism():
    a = _run(2, 3)
    b = _run(4, 7)
    assert a == b
    assert len(a) > 0 and a[0][1] == 0

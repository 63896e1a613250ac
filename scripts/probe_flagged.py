"""Min-of-3 warmed probe for the round-9 flagged gates (verdict item 1),
run after the lazy-__init__ + worker pre-import fixes. Records first
attempt separately so the import-tax reduction is visible."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from vectorflow_spark.session import get_spark

GATES = [
    "q_pdf_roundtrip", "q_docx_roundtrip", "q_rtf_roundtrip", "q_epub_roundtrip",
    "q_parquet_meta", "q_webdataset_scan", "q_video_neardup_pairs",
]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe")
qmap = entrymod.queries()

def mat(df):
    df.write.format("noop").mode("overwrite").save()

# same warm-up as bench.py: JVM + Arrow worker pool, NO format pre-import
# for the first gate so attempt-1 shows the residual import cost honestly
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
_w = F.pandas_udf(lambda s: s, LongType())
spark.range(1024, numPartitions=32).select(_w("id")).write.format("noop").mode("overwrite").save()

out = {}
for name in GATES:
    runs = []
    for i in range(4):
        t0 = time.time()
        mat(qmap[name](spark, sf_dir))
        runs.append(round(time.time() - t0, 3))
    out[name] = {"first": runs[0], "warmed_min3": min(runs[1:]), "runs": runs}
print(json.dumps(out, indent=1))

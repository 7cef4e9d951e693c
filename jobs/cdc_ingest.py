"""spark-submit job script for the CDC ingest pipeline.

    python -m sap_spark.cli package --out /tmp/sap_spark.zip
    spark-submit --master <cluster> --py-files /tmp/sap_spark.zip \
        jobs/cdc_ingest.py --log <changelog> --table <lake-table> \
        --checkpoint <ckpt-dir> [--keys repo,path] [--buckets 4096]

All arguments: see ``python -m sap_spark.cli ingest --help``.
"""

import sys

from sap_spark.cli import main

if __name__ == "__main__":
    main(["ingest", *sys.argv[1:]])

"""spark-submit entry shim.

`spark-submit --py-files dist/ethereum_etl_spark.zip run_cli.py <args>`
— the zip lands on every executor's PYTHONPATH; this shim just forwards
to the package CLI (gen / apply / tail / stream / show / lookup /
since / changes / lineage / compact / vacuum / export / multi).
"""

import sys

from ethereum_etl_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

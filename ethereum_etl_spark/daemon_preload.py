"""PySpark worker daemon with preloaded scientific stack.

Used via ``spark.python.daemon.module=ethereum_etl_spark.daemon_preload``.

Why: with ``spark.python.worker.reuse=false`` (which we need — long-lived
reused pandas workers degrade 2-5x under sustained Arrow-UDF load) every
task forks a FRESH worker from the daemon, and anything not already
imported in the daemon is re-imported per task. pandas+pyarrow+numpy cost
~1s per import — a 30-100% tax on small UDF tasks. Importing them HERE,
before ``manager()`` starts forking, makes every forked worker inherit
the warm modules through copy-on-write for free.

Also pre-imports the engine's UDF modules so compiled regex tables are
shared COW as well.
"""

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "ethereum_etl_spark.functions.extract",
    "ethereum_etl_spark.functions.textstats",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # never block worker startup on a preload failure
        pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()

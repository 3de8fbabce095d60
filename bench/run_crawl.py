#!/usr/bin/env python
"""spark-submit entry point (north rule: "run via spark-submit
--py-files on a multi-executor cluster"):

    python -c "from pompspark.session import make_pyfiles_zip as z; z()"
    spark-submit --py-files pompspark.zip bench/run_crawl.py

On a cluster, pass --master and executor confs as usual; the script
defers to the submitted master (build_spark(master=None)). Locally it
behaves exactly like bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import bench

    bench.run()

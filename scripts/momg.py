#!/usr/bin/env python3
"""spark-submit entry point for the CLI driver.

    spark-submit --py-files momg.zip scripts/momg.py pagerank -g graph.mtx -o out

(`--py-files` ships the mirrorofmapgraph_spark package to executors on a
real cluster; locally a checkout on PYTHONPATH suffices.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mirrorofmapgraph_spark.cli import main

if __name__ == "__main__":
    main()

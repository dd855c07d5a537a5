"""``python -m mirrorofmapgraph_spark <algo> ...`` — same driver as
``python -m mirrorofmapgraph_spark.cli`` / ``scripts/momg.py`` (the
spark-submit entry); see cli.py for the full argv surface."""

from .cli import main

if __name__ == "__main__":
    main()

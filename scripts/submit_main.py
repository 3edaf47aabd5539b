"""spark-submit primary script: thin shim over the package CLI.

spark-submit wants a primary ``.py`` file (not ``-m module``); the engine
itself ships in the ``--py-files`` zip.  This file must stay import-light so
the only code path is the zipped package.

  spark-submit --master spark://... --py-files dist/er_engine.zip \
      scripts/submit_main.py --synthetic 5000 --output /data/er_out
"""

from lab02_citation_matching_and_entity_resolution_spark.cli import main

if __name__ == "__main__":
    main()

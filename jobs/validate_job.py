"""spark-submit driver script.

    spark-submit --py-files dist/engine.zip jobs/validate_job.py \
        validate --input <table-or-path> --contract contract.yaml ...

All logic lives in data_contract_engine_spark.cli (shipped in the zip);
this file only needs to exist outside it so spark-submit has a script.
"""

import sys

from data_contract_engine_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""spark-submit driver script.

The package itself ships via --py-files (see make_submit_zip.py); this
file is the application script spark-submit executes on the driver:

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/irkg.zip scripts/submit.py \
        run --pages hdfs:///data/pages --workdir hdfs:///data/kg
"""

import sys

from inclusionreferenceskg_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

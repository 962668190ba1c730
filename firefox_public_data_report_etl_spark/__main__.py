"""``python -m firefox_public_data_report_etl_spark`` entry point
(reference cli.py:17-19)."""

import sys

from firefox_public_data_report_etl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

"""``python -m local_pubchem_db_spark`` — same CLI as build_pubchem_db.py."""

import sys

from local_pubchem_db_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Reference-parity CLI (build_pubchem_db.py:32-54): build the compounds
database from a directory of PubChem SDF files.

    python build_pubchem_db.py <base_dir> [--gzip] [--reset]
                               [--db_layout_fn FILE]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_pubchem_db_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

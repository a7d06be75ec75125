"""Command-line entry point with argument and exit-code parity to the
reference's ``build_pubchem_db.py:32-54``:

    python build_pubchem_db.py <base_dir> [--gzip] [--reset]
                               [--db_layout_fn FILE]

``base_dir`` must contain an ``sdf/`` folder; the build writes
``<base_dir>/db/``. The default layout is the repo-shipped
``default_db_layout.json`` — a corrected copy of the reference's
``default_db_layout.json:22``, whose ``InChIKey_1`` CREATE_LIKE value
(``"lambda: __x: ..."``) is not valid Python and would fail the
reference's own eval; here it is the intended ``lambda __x:
__x.split('-')[0]``, which the layout compiler translates to a native
``split()`` expression (no Python eval on this path).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_LAYOUT = os.path.join(_REPO_ROOT, "default_db_layout.json")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="build_pubchem_db")
    parser.add_argument(
        "base_dir",
        type=str,
        help="Base-directory containing the 'db/' and 'sdf/' folders.",
    )
    parser.add_argument(
        "--gzip",
        action="store_true",
        help="If true, sdf-files are assumed to be compressed using gzip "
        "and do have file extension '.gz'.",
    )
    parser.add_argument(
        "--reset",
        action="store_true",
        help="If true, all existing tables will be deleted and the DB will "
        "be re-build.",
    )
    parser.add_argument(
        "--db_layout_fn",
        type=str,
        default=DEFAULT_LAYOUT,
        help="JSON-file specifying the database layout.",
    )
    args = parser.parse_args(argv)

    from local_pubchem_db_spark import build_db, load_db_specifications

    db_specs = load_db_specifications(args.db_layout_fn)
    # The CLI is the reference-parity surface: the reference evals
    # CREATE_LIKE lambdas from the user-supplied layout unconditionally,
    # so the explicitly-passed layout file is treated as code here too.
    # Library callers get the safe default (False) on build_db itself.
    return build_db(
        args.base_dir,
        args.gzip,
        args.reset,
        db_specs,
        allow_python_transforms=True,
    )


if __name__ == "__main__":
    sys.exit(main())

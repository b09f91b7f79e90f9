"""``python -m tinymr_spark`` — the module-execution surface the
reference's CI exercises (``python3 -m tinymr --version``, reference
.github/workflows/tests.yml:44).  ``--version`` prints the resolved
version (with ``--verbose`` adding the environment facts a bug report
needs); with no arguments the parser's help is shown instead of
silently printing the version for flags that never asked for it."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    import tinymr_spark

    parser = argparse.ArgumentParser(prog="tinymr_spark")
    parser.add_argument(
        "--version", action="store_true", help="print the package version"
    )
    parser.add_argument(
        "--verbose", action="store_true", help="also print runtime environment facts"
    )
    args = parser.parse_args(argv)
    if not args.version and not args.verbose:
        parser.print_help()
        return 0
    print(tinymr_spark.__version__)
    if args.verbose:
        import pyspark

        print(f"python {sys.version.split()[0]}")
        print(f"pyspark {pyspark.__version__}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Convert published Unicorn result tables into metric_dict.json schema
(reference: scripts/convert_unicorn_results.py). Same input contract as
convert_sparsepcgc_results.py."""
import sys

from convert_sparsepcgc_results import main

if __name__ == '__main__':
    main()

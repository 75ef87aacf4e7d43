"""International address handling (mirrors reference examples/international).

Run: python examples/international.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deidentify_spark.oracle import Deidentifier

d = Deidentifier("example-key")
for addr in [
    "123 Main Street, Springfield, IL",
    "42 Rue de la Paix, Paris, France",
    "789 Königstraße, Berlin, Germany",
    "123 Orchard Road, Singapore",
    "European HQ: 15 Rue de Rivoli, Paris, France",
]:
    print(f"{addr!r:55} -> {d.address(addr)!r}")

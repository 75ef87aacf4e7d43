"""Basic text de-identification (mirrors reference examples/basic).

Run: python examples/basic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deidentify_spark.oracle import Deidentifier, generate_secret_key

text = """From: Legolas Greenleaf <legolas@mirkwood.elf>
My phone number is (555) 123-4567 and my SSN is 123-45-6789.
I made a payment using my credit card 4111-1111-1111-1111 yesterday.
I live at 15 Woodland Realm, Mirkwood Forest, Middle-earth."""

d = Deidentifier(generate_secret_key())
print("Original:\n" + text)
print("\nRedacted:\n" + d.text(text))

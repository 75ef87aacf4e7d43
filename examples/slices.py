"""Slices (row-major CSV-like) de-identification — behavioral port of the
reference demo (/root/reference/examples/slices/main.go:23-155).

Covers the same four demos:
 1. explicit column types + names over CSV-like rows (empty row preserved);
 2. deterministic behavior (same input + key -> identical output);
 3. "column-specific mapping" — replicated faithfully, which means the
    honest output is ``Different results: False``: column names only
    namespace the memo cache, they never reach the HMAC
    (deidentify.go:331-335), so with the SAME secret key the same value
    maps to the same replacement regardless of column name. The Go demo
    (main.go:87-101) prints a misleading banner; SURVEY.md §0.2 documents
    why we replicate the code, not the README.
 4. batch processing + automatic type inference.

Run: python examples/slices.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deidentify_spark.oracle import Deidentifier, generate_secret_key


def print_slices(data: list[list[str]]) -> None:
    if not data:
        print("(empty)")
        return
    widths = [
        max(15, *(len(row[i]) for row in data)) for i in range(len(data[0]))
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(sep)
    for i, row in enumerate(data):
        cells = [
            (c or "<empty>").ljust(w)[:w] for c, w in zip(row, widths)
        ]
        print("| " + " | ".join(cells) + " |")
        if i == 0:
            print(sep)
    print(sep)


def main() -> None:
    secret_key = generate_secret_key()
    d = Deidentifier(secret_key)

    customer_data = [
        ["Name", "Email", "Phone", "SSN", "Address"],
        ["Alice Johnson", "alice.johnson@techcorp.com", "+1 (555) 123-4567",
         "123-45-6789", "123 Oak Street, Portland, OR"],
        ["Bob Smith", "bob.smith@example.org", "555-987-6543",
         "987-65-4321", "456 Pine Avenue, Seattle, WA"],
        ["Carol Davis", "carol@startup.io", "(555) 111-2222",
         "456-78-9012", "789 Maple Drive, San Francisco, CA"],
        ["", "", "", "", ""],
        ["David Wilson", "david.wilson@company.net", "555.333.4444",
         "321-54-9876", "321 Elm Street, Austin, TX"],
    ]
    column_types = ["name", "email", "phone", "ssn", "address"]
    column_names = [
        "customer_name", "customer_email", "customer_phone",
        "customer_ssn", "customer_address",
    ]

    print("Original Customer Data:")
    print_slices(customer_data)

    deidentified = d.slices(customer_data[1:], column_types, column_names)
    print("\nDeidentified Customer Data:")
    print_slices([customer_data[0]] + deidentified)

    print("\n=== Deterministic Behavior Demo ===")
    sample_row = [customer_data[1]]
    r1 = d.slices(sample_row, column_types, column_names)
    r2 = d.slices(sample_row, column_types, column_names)
    print(f"First run:  {r1[0]}")
    print(f"Second run: {r2[0]}")
    print(f"Identical results: {r1[0] == r2[0]}")
    assert r1[0] == r2[0]

    print("\n=== Column-Specific Mapping Demo ===")
    d2 = Deidentifier(secret_key)
    employee_names = [
        "employee_name", "employee_email", "employee_phone",
        "employee_ssn", "employee_address",
    ]
    r3 = d2.slices(sample_row, column_types, employee_names)
    print(f"Customer context: {r1[0][0]}")
    print(f"Employee context: {r3[0][0]}")
    # Faithful to the implementation: with the SAME key this is False —
    # replacements are HMAC(secret_key, value) only; the column name is
    # just a cache namespace (SURVEY.md §0.2, deidentify.go:331-335).
    print(f"Different results: {r1[0][0] != r3[0][0]}")
    assert r1[0][0] == r3[0][0]

    print("\n=== Batch Processing Demo ===")
    all_data = [
        ["John Doe", "john@example.com", "555-0001", "111-11-1111", "100 First St"],
        ["Jane Doe", "jane@example.com", "555-0002", "222-22-2222", "200 Second St"],
        ["Jim Doe", "jim@example.com", "555-0003", "333-33-3333", "300 Third St"],
    ]
    batch_size = 2
    processed: list[list[str]] = []
    for i in range(0, len(all_data), batch_size):
        batch = all_data[i : i + batch_size]
        out = d.slices(batch, column_types, column_names)
        processed.extend(out)
        print(f"Processed batch {i // batch_size + 1}: {len(out)} rows")
    print(f"Total processed: {len(processed)} rows")
    # batching never changes results (pure function of (key, value))
    assert processed == d.slices(all_data, column_types, column_names)

    print("\n=== Automatic Type Inference Demo ===")
    auto_data = [
        ["john.doe@example.com", "John Doe", "555-123-4567", "123-45-6789"],
        ["jane.smith@company.org", "Jane Smith", "(555) 987-6543", "987-65-4321"],
        ["bob@test.co.uk", "Bob Johnson", "555.111.2222", "456-78-9012"],
    ]
    inferred = d.infer_column_types(auto_data)
    auto_result = d.slices(auto_data)
    print("Original data (auto-inference):")
    print_slices(auto_data)
    print("\nDeidentified data (auto-inferred types):")
    print_slices(auto_result)
    assert inferred == ["email", "name", "phone", "ssn"]
    print("✓ Types automatically detected: Email, Name, Phone, SSN")


if __name__ == "__main__":
    main()

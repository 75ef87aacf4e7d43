"""Scalar ground-truth oracle (faithful transcription of the reference)."""

from .core import (
    ALL_TYPES,
    TYPE_ADDRESS,
    TYPE_CREDIT_CARD,
    TYPE_EMAIL,
    TYPE_GENERIC,
    TYPE_NAME,
    TYPE_PHONE,
    TYPE_SSN,
    Deidentifier,
    generate_secret_key,
    hash_to_index,
    luhn_check_digit,
)

__all__ = [
    "ALL_TYPES",
    "TYPE_ADDRESS",
    "TYPE_CREDIT_CARD",
    "TYPE_EMAIL",
    "TYPE_GENERIC",
    "TYPE_NAME",
    "TYPE_PHONE",
    "TYPE_SSN",
    "Deidentifier",
    "generate_secret_key",
    "hash_to_index",
    "luhn_check_digit",
]

"""Extensions BEYOND the reference's detector set.

BASELINE.json's north_star lists IP addresses among the PII classes, but
the reference library has no IP detector (patterns.go has none). This
module adds one as an opt-in extension, kept strictly out of the default
``Deidentifier.text()`` path so reference byte-parity is untouched:
``ExtendedDeidentifier.text()`` runs the IP pass between the email pass
and the phone pass (after emails so quads inside email hostnames belong
to the email replacement; before phones so remaining quads can't be
half-eaten by the phone shape).

Detection is validated, not just shape-matched: the dotted-quad regex is
gated on every octet being <= 255 (the "checksum" analogue for IPs).
Replacement is deterministic and format-preserving into documentation/
private space: 10.x.y.z from HMAC slices — same (key, value) -> same
fake, like every reference generator.
"""

from __future__ import annotations

import regex

from .core import Deidentifier, hash_to_index

TYPE_IP = "ip"

# Dotted quad with ASCII digit-run boundaries: no partial matches inside
# longer dotted runs (v1.2.3.4.5), but a sentence-ending period after the
# quad is fine — the right boundary only rejects digit / dot-digit
# continuations.
IPV4_PATTERN = (
    r"(?<![0-9.])"
    r"([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})"
    r"(?!\.?[0-9])"
)
IPV4_RE = regex.compile(IPV4_PATTERN)


def is_valid_ipv4(candidate: str) -> bool:
    m = IPV4_RE.fullmatch(candidate)
    return bool(m) and all(int(g) <= 255 for g in m.groups())


class ExtendedDeidentifier(Deidentifier):
    """Reference engine + opt-in IP detection/replacement."""

    def generate_ip(self, original: str) -> str:
        """Deterministic private-range fake: 10.a.b.c from HMAC slices."""
        h = self.deterministic_hash(original)
        a = hash_to_index(h[:8], 256)
        b = hash_to_index(h[8:16], 256)
        c = hash_to_index(h[16:24], 256)
        return f"10.{a}.{b}.{c}"

    # extend the base dispatch table instead of re-implementing the
    # memo/dispatch protocol (base deidentify_value handles empty-string,
    # generic-passthrough and memoization for TYPE_IP identically)
    _GENERATORS = {**Deidentifier._GENERATORS, TYPE_IP: generate_ip}

    def _process_ips(self, text: str) -> str:
        def repl(m):
            candidate = m.group(0)
            if not all(int(g) <= 255 for g in m.groups()):
                return candidate  # shape matched but octets invalid
            return self.deidentify_value(candidate, TYPE_IP, "ip")

        return IPV4_RE.sub(repl, text)

    def _process_phones(self, text: str) -> str:
        """IP pass sits BETWEEN the email pass and the phone pass: after
        emails so a dotted quad inside an email hostname is consumed by
        the email replacement (running IPs first rewrote the quad and
        made text()'s output diverge from the scalar .email() API for
        the same value), and before phones so remaining quads can't be
        half-eaten by the phone shape."""
        return super()._process_phones(self._process_ips(text))

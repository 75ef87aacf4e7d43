"""Go-`fmt.Sprintf("%v", x)`-parity coercion of non-string cells.

The reference's Table API stringifies every cell with Go's `%v` verb
(deidentify.go:199) before hashing it into a deterministic replacement,
so the *textual form* of a bool/float decides which replacement the cell
maps to. Python's ``str()`` disagrees with Go on exactly two types:

* bool: Python ``'True'`` vs Go ``'true'``;
* float: Go uses ``strconv.FormatFloat(f, 'g', -1, 64)`` — the shortest
  round-trip decimal, fixed notation for decimal exponents in [-4, 6),
  no trailing ``.0`` on integral values (``100000.0`` -> ``"100000"``),
  two-digit ``e±XX`` scientific outside that range (``1e6`` ->
  ``"1e+06"``, ``1e20`` -> ``"1e+20"``). The upper bound is 6, not the
  ES6/encoding-json 21: Go's ftoa.go shortest-'g' branch sets
  ``eprec = 6`` ("use precision 6 for this decision"), which is why
  ``fmt.Println(1e6)`` prints ``1e+06`` and JSON-decoded float64
  timestamps print as ``1.454954400139e+12``. (No Go toolchain in this
  sandbox — verified against documented strconv semantics and the
  ftoa.go source; re-verify with fmt.Sprintf("%v") if one appears.)

Both the scalar oracle (`Deidentifier.table`) and the Spark path
(`deidentify_table`) route non-string cells through these helpers so the
two engines and the reference agree byte-for-byte.
"""

from __future__ import annotations

import math


def go_format_float(f: float, bits: int = 64) -> str:
    """Go strconv.FormatFloat(f, 'g', -1, bits). ``bits=32`` computes the
    float32-shortest digit string (numpy's float32 repr), matching Go's
    %v of a float32 — the float64-shortest form of the same value would
    be e.g. '0.10000000149011612' instead of '0.1'."""
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    if f == 0.0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    neg = "-" if f < 0 else ""
    if bits == 32:
        import numpy as np

        s = repr(np.float32(abs(float(f))))  # float32-shortest digits
    else:
        s = repr(abs(float(f)))  # shortest round-trip digits (float_repr)
    if "e" in s:
        mant, _, ex = s.partition("e")
        e = int(ex)
        digs = mant.replace(".", "")
        # python mantissa is d.ddd — decimal exponent already relative to
        # the leading digit
    else:
        ip, _, fp = s.partition(".")
        all_digs = (ip + fp).lstrip("0")
        lead_zeros = len(ip + fp) - len(all_digs)
        e = len(ip) - 1 - lead_zeros
        digs = all_digs
    digs = digs.rstrip("0") or "0"
    # Go ftoa.go 'g'-shortest: %e when exp < -4 or exp >= 6 (eprec=6).
    if -4 <= e < 6:
        if e >= len(digs) - 1:
            out = digs + "0" * (e - (len(digs) - 1))
        elif e >= 0:
            out = digs[: e + 1] + "." + digs[e + 1 :]
        else:
            out = "0." + "0" * (-e - 1) + digs
    else:
        mant = digs[0] + ("." + digs[1:] if len(digs) > 1 else "")
        out = f"{mant}e{'+' if e >= 0 else '-'}{abs(e):02d}"
    return neg + out


def go_format_value(v) -> str:
    """Go `%v` for the cell types a table can carry (bool/float/int/str)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_format_float(v)
    return str(v)

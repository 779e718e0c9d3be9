"""Python-`repr` rendering of doubles as a pure JVM expression.

The reference renders packed-bin floats with Python f-strings
(main.py:163-170, 239-244), i.e. CPython ``repr``: the shortest decimal
that round-trips, printed positionally when the decimal exponent is in
[-4, 16) and as ``d[.ddd]e±XX`` scientific outside it. DuckDB's
``DOUBLE::VARCHAR`` emits the identical bytes, which is what makes the
snapshot oracle byte-comparable.

Java's ``Double.toString`` (the engine behind Spark's double→string cast)
produces the same shortest digit sequence but different FORMATTING
thresholds: it switches to ``d.dddE±X`` scientific whenever |x| < 1e-3 or
|x| >= 1e7, and never zero-pads the exponent. So ``0.0001`` renders as
``1.0E-4`` and ``5e-05`` as ``5.0E-5``.

:func:`py_float_repr_expr` converts the Java rendering to the CPython one
with pure string expressions, so strict-parity mode needs no Python worker
round trip (the pandas-UDF form it replaces cost two ArrowEvalPython
stages in the snapshot pipeline). Two structural tricks keep the
expression tree small enough to evaluate fast:

- the derived parts (digit string, exponent, sign) are bound ONCE per row
  through a single-element ``transform`` lambda — a poor man's LET
  binding; naive composition would splice the digit-extraction subtree
  into every one of its ~6 uses (Spark's subexpression elimination does
  not reach across CASE WHEN branches, so the duplicated work is real);
- Java's mantissa is already trailing-zero-free except the integral
  ``d.0`` form, so "strip the point and trim zeros" reduces to one
  conditional ``translate`` — no regexp.

Byte equality with CPython over adversarial + random values is pinned by
tests/test_scalar_functions.py::test_py_float_repr_expr.

Exact regime: byte-identical to CPython repr for 0, ±nan/inf, and every
NORMAL double with |x| < 2^53 (~9.0e15). Outside it — |x| >= 2^53 and
denormals below ~2.2e-308 — Java emits more (still round-tripping) digits
than CPython's shortest form, so the bytes can differ while the VALUE
parses identically. The packed-bin strings this feeds render token/fee
amounts (<= ~1e7 by construction), squarely inside the exact regime; the
pandas-UDF ``py_float_repr`` remains the anywhere-exact fallback.

Scale note: a handful of string primitives inside the scan's projection —
O(len) per value, no shuffle, no Python worker.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX = 2147483647


def _substr(c: Column, pos: Column, length: Column | None = None) -> Column:
    if length is None:
        length = F.lit(_MAX)
    return F.call_function("substring", c, pos, length)


def _render_sci_parts(p: Column) -> Column:
    """CPython rendering from bound parts struct (d=digits, e=exp, n=neg).

    References to ``p["..."]`` are lambda-variable reads — evaluated parts,
    not re-spliced subtrees."""
    d, e, n = p["d"], p["e"], p["n"]
    ndig = F.length(d)

    # scientific: d[.rest]e±XX (exponent zero-padded to >= 2 digits;
    # lpad would TRUNCATE 3-digit exponents)
    abs_e = F.abs(e).cast("string")
    sci = F.concat(
        F.when(ndig > 1, F.concat(_substr(d, F.lit(1), F.lit(1)), F.lit("."), _substr(d, F.lit(2)))).otherwise(d),
        F.lit("e"),
        F.when(e < 0, F.lit("-")).otherwise(F.lit("+")),
        F.when(F.length(abs_e) < 2, F.concat(F.lit("0"), abs_e)).otherwise(abs_e),
    )

    # positional, e in [-4, -1]: 0.<zeros><digits>
    small_pos = F.concat(
        F.lit("0."), F.call_function("repeat", F.lit("0"), -e - F.lit(1)), d
    )

    # positional, e in [7, 15]: point after e+1 digits, zero-padded;
    # integral values carry ".0"
    int_len = e + F.lit(1)
    big_pos = F.when(
        ndig <= int_len,
        F.concat(F.call_function("rpad", d, int_len, F.lit("0")), F.lit(".0")),
    ).otherwise(
        F.concat(_substr(d, F.lit(1), int_len), F.lit("."), _substr(d, int_len + F.lit(1)))
    )

    return F.concat(
        F.when(n, F.lit("-")).otherwise(F.lit("")),
        F.when((e < -4) | (e >= 16), sci).when(e < 0, small_pos).otherwise(big_pos),
    )


def py_float_repr_expr(col: Column) -> Column:
    """Render a double exactly as CPython ``repr`` would, JVM-side.

    Handles NaN/±Infinity (→ ``nan``/``inf``/``-inf``), negative zero,
    integral doubles, and both scientific-notation regimes. NULL in →
    NULL out (same contract as the pandas-UDF form it replaces).
    """
    j = col.cast("string")

    # Java scientific form "<mant>E<exp>", mant = [-]d.d+ with exactly one
    # integer digit and shortest fraction (so the only trailing zero is the
    # integral "d.0" form).
    mant = F.substring_index(j, "E", 1)
    exp = F.substring_index(j, "E", -1).cast("int")
    neg = mant.startswith("-")
    mant_abs = F.when(neg, _substr(mant, F.lit(2))).otherwise(mant)
    digits = F.when(
        mant_abs.endswith(".0"), _substr(mant_abs, F.lit(1), F.lit(1))
    ).otherwise(F.translate(mant_abs, ".", ""))

    # bind (digits, exp, neg) once via a 1-element transform — the lambda
    # body reads them as variables instead of re-evaluating the extraction
    # subtree at every use site
    parts = F.array(F.struct(digits.alias("d"), exp.alias("e"), neg.alias("n")))
    from_sci = F.get(F.transform(parts, _render_sci_parts), F.lit(0))

    return (
        F.when(F.isnan(col), F.lit("nan"))
        .when(col == F.lit(float("inf")), F.lit("inf"))
        .when(col == F.lit(float("-inf")), F.lit("-inf"))
        # Java positional regime (1e-3 <= |x| < 1e7, and 0.0): CPython is
        # also positional there (its window is the wider [1e-4, 1e16)) with
        # the same shortest digits — pass through.
        .when(j.contains("E"), from_sci)
        .otherwise(j)
    )

"""A small Wilkinson-formula engine (parser + materializer).

Implemented natively because ``formulaic`` is unavailable in this
environment.  Grammar subset (covering the reference's documented surface,
``tabmat/formula.py``):

    formula  := [lhs "~"] rhs
    rhs      := term (("+"|"-") term)*
    term     := factor ((":"|"*") factor)*       ("*" expands: a*b = a+b+a:b)
    factor   := "1" | "0" | name | C(name, ...) | func(expr) | (expr)

Numeric factors become dense/sparse columns; categorical factors become
CategoricalMatrix blocks; interactions multiply numerics elementwise and
combine categoricals by code arithmetic (cat×cat product categories use
``left.codes * card(right) + right.codes``-style composition like the
reference's ``_interact_categoricals``, ``formula.py:627-667``).
"""

def materialize_formula(*args, **kwargs):  # placeholder, replaced later this round
    raise NotImplementedError("formula engine under construction")

"""Formula materializer: evaluate parsed terms against a dataframe.

Own implementation of the reference's formulaic-based materializer
(``tabmat/formula.py:35-810``), with the same encoding/interaction algebra:

- numeric factors → dense or sparse single columns by observed density;
- categorical factors → code vectors with sentinels (-1 missing, -2 drop);
- numeric × numeric → elementwise product;
- categorical × numeric → per-row multipliers on the categorical;
- categorical × categorical → product categories via code arithmetic
  ``right.codes * card(left) + left.codes`` (cf. ``formula.py:627-667``);
- reduced-rank encoding drops the first level by marking its rows -2;
- stateful re-materialization: the returned matrix carries a
  ``model_spec`` whose ``get_model_matrix(new_data)`` re-encodes new data
  with the remembered category levels.

Full-rank logic (``ensure_full_rank=True``) uses the patsy-style rule: a
categorical factor in a term is reduced-rank iff the term minus that factor
is already spanned (the intercept spans the empty term).
"""

from dataclasses import dataclass, field
from functools import reduce
from itertools import product
from typing import Any, Optional

import numpy as np
from scipy import sparse as sps

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

try:
    import narwhals.stable.v2 as nw
except ImportError:  # pragma: no cover
    nw = None

from ..models.categorical import CategoricalMatrix, _extract_codes_and_categories
from ..models.dense import DenseMatrix
from ..models.sparse import SparseMatrix
from ..models.split import SplitMatrix
from ..constructors import _split_sparse_and_dense_parts
from .parser import parse_formula


# ----------------------------------------------------------------------
# factor slots (the interaction algebra operands)
# ----------------------------------------------------------------------


@dataclass
class NumericSlot:
    """A numeric column (optionally the product of several factors)."""

    values: np.ndarray  # (n,)
    name: str


@dataclass
class CategoricalSlot:
    """A categorical column with sentinel codes (-1 missing, -2 drop)."""

    codes: np.ndarray  # (n,) int64
    categories: list  # formatted column labels, one per live category
    multipliers: np.ndarray  # (n,) accumulated numeric interaction factors
    name: str


def interact(left, right, separator=":"):
    """Interact two slots (order-preserving names)."""
    if isinstance(left, NumericSlot) and isinstance(right, NumericSlot):
        return NumericSlot(
            left.values * right.values, f"{left.name}{separator}{right.name}"
        )
    if isinstance(left, NumericSlot) and isinstance(right, CategoricalSlot):
        return CategoricalSlot(
            codes=right.codes,
            categories=[f"{left.name}{separator}{c}" for c in right.categories],
            multipliers=right.multipliers * left.values,
            name=f"{left.name}{separator}{right.name}",
        )
    if isinstance(left, CategoricalSlot) and isinstance(right, NumericSlot):
        return CategoricalSlot(
            codes=left.codes,
            categories=[f"{c}{separator}{right.name}" for c in left.categories],
            multipliers=left.multipliers * right.values,
            name=f"{left.name}{separator}{right.name}",
        )
    # categorical × categorical: product categories by code arithmetic
    card_left = len(left.categories)
    new_codes = right.codes * card_left + left.codes
    na = (left.codes == -1) | (right.codes == -1)
    drop = (left.codes == -2) | (right.codes == -2)
    new_codes[na] = -1
    new_codes[drop] = -2
    new_categories = [
        f"{lc}{separator}{rc}" for rc, lc in product(right.categories, left.categories)
    ]
    return CategoricalSlot(
        codes=new_codes,
        categories=new_categories,
        multipliers=left.multipliers * right.multipliers,
        name=f"{left.name}{separator}{right.name}",
    )


# ----------------------------------------------------------------------
# factor evaluation
# ----------------------------------------------------------------------


@dataclass
class FactorState:
    """Remembered encoding state for out-of-sample re-materialization."""

    kind: str  # 'numeric' | 'categorical'
    categories: Optional[list] = None  # raw levels (categorical only)
    spans_intercept: bool = True


def _parse_C_call(expr: str):
    """Split a ``C(...)`` factor into (inner_expression, kwargs_src)."""
    inner = expr[2:-1]
    depth = 0
    parts = []
    start = 0
    for i, ch in enumerate(inner):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    data_expr = parts[0].strip()
    kwargs = {}
    for p in parts[1:]:
        if "=" not in p:
            raise ValueError(f"Unsupported positional argument in C(): {p!r}")
        key, val = p.split("=", 1)
        kwargs[key.strip()] = val.strip()
    return data_expr, kwargs


class _Evaluator:
    """Evaluate factor expressions against a dataframe + context."""

    def __init__(self, df, context, state: dict, use_state: bool):
        self.df = df  # narwhals frame
        self.context = dict(context or {})
        self.state = state  # factor expr -> FactorState
        self.use_state = use_state

    def _column(self, name: str):
        if name in self.df.columns:
            return self.df[name]
        return None

    def _eval_python(self, expr: str):
        ns = dict(self.context)
        ns.setdefault("np", np)
        ns.setdefault("I", lambda v: v)  # patsy-style identity transform
        ns.setdefault("log", np.log)
        ns.setdefault("exp", np.exp)
        ns.setdefault("sqrt", np.sqrt)
        # expose dataframe columns as names
        for col in self.df.columns:
            if col.isidentifier():
                ns[col] = self._to_numpy_or_series(self.df[col])
        return eval(expr, {"__builtins__": {}}, ns)  # noqa: S307

    @staticmethod
    def _to_numpy_or_series(col):
        native = nw.to_native(col) if nw is not None else col
        return native

    @staticmethod
    def _is_categorical_like(values) -> bool:
        if pd is not None and isinstance(values, (pd.Categorical, pd.Series)):
            if isinstance(values, pd.Series):
                return isinstance(values.dtype, pd.CategoricalDtype) or (
                    values.dtype == object
                )
            return True
        if isinstance(values, np.ndarray):
            return values.dtype == object or values.dtype.kind in "US"
        return False

    def eval_factor(self, expr: str, cat_missing_method: str, cat_missing_name: str):
        """Evaluate one factor expression → NumericSlot or CategoricalSlot."""
        spans_intercept = True
        levels = None

        if expr.startswith("C(") and expr.endswith(")"):
            data_expr, kwargs = _parse_C_call(expr)
            if "levels" in kwargs:
                levels = list(eval(kwargs["levels"], {"__builtins__": {}}, {"np": np}))  # noqa: S307
            if "spans_intercept" in kwargs:
                spans_intercept = kwargs["spans_intercept"] == "True"
            col = self._column(data_expr)
            values = col if col is not None else self._eval_python(data_expr)
            return self._encode_categorical(
                expr, values, levels, spans_intercept, cat_missing_method, cat_missing_name
            )

        col = self._column(expr)
        if col is not None:
            dtype = col.dtype
            if nw is not None and isinstance(
                dtype, (nw.Categorical, nw.Enum, nw.String, nw.Object)
            ):
                return self._encode_categorical(
                    expr, col, levels, spans_intercept,
                    cat_missing_method, cat_missing_name,
                )
            values = col.to_numpy()
            return NumericSlot(np.asarray(values, dtype=np.float64), expr)

        values = self._eval_python(expr)
        if self._is_categorical_like(values):
            return self._encode_categorical(
                expr, values, levels, spans_intercept,
                cat_missing_method, cat_missing_name,
            )
        values = np.asarray(values, dtype=np.float64)
        if values.ndim == 0 or values.size == 1:
            # scalar transform result → constant column
            values = np.full(self.df.shape[0], float(np.ravel(values)[0]))
        elif values.ndim != 1:
            values = values.reshape(-1)
        return NumericSlot(values, expr)

    def _encode_categorical(
        self, expr, values, levels, spans_intercept, missing_method, missing_name
    ):
        if self.use_state and expr in self.state:
            st = self.state[expr]
            cats = np.asarray(st.categories, dtype=object)
            spans_intercept = st.spans_intercept
            raw = self._raw_values(values)
            lookup = {c: i for i, c in enumerate(cats)}
            codes = np.full(len(raw), -1, dtype=np.int64)
            unseen = []
            for i, val in enumerate(raw):
                if val is None or (isinstance(val, float) and val != val):
                    continue
                code = lookup.get(val)
                if code is None:
                    unseen.append(val)
                else:
                    codes[i] = code
            if unseen:
                raise ValueError(
                    f"Categorical factor {expr!r} has unseen categories: "
                    f"{sorted(set(map(str, unseen)))[:5]}"
                )
            categories = list(cats)
        else:
            if levels is not None:
                raw = self._raw_values(values)
                lookup = {c: i for i, c in enumerate(levels)}
                codes = np.array(
                    [
                        lookup.get(v, -1)
                        if not (v is None or (isinstance(v, float) and v != v))
                        else -1
                        for v in raw
                    ],
                    dtype=np.int64,
                )
                categories = list(levels)
            else:
                codes, cats = _extract_codes_and_categories(values)
                codes = codes.astype(np.int64)
                categories = list(cats)
            self.state[expr] = FactorState(
                kind="categorical",
                categories=list(categories),
                spans_intercept=spans_intercept,
            )

        if missing_method == "fail" and (codes == -1).any():
            raise ValueError(
                "Categorical data can't have missing values "
                "if cat_missing_method='fail'."
            )
        if missing_method == "convert" and (codes == -1).any():
            if missing_name in categories:
                raise ValueError(f"Missing category {missing_name} already exists.")
            codes = np.where(codes == -1, len(categories), codes)
            categories = categories + [missing_name]
        # 'zero': leave -1 codes; they produce all-zero rows downstream

        slot = CategoricalSlot(
            codes=codes,
            categories=categories,
            multipliers=np.ones(len(codes)),
            name=expr,
        )
        slot.spans_intercept = spans_intercept
        return slot

    @staticmethod
    def _raw_values(values):
        if nw is not None:
            maybe = nw.from_native(values, series_only=True, pass_through=True)
            if isinstance(maybe, nw.Series):
                return maybe.to_numpy()
        if pd is not None and isinstance(values, pd.Series):
            return values.to_numpy()
        return np.asarray(values)


def _reduce_rank(slot: CategoricalSlot) -> CategoricalSlot:
    """Drop the first live category (rows of it get sentinel -2)."""
    codes = slot.codes.copy()
    codes[codes == 0] = -2
    codes[codes > 0] -= 1
    out = CategoricalSlot(
        codes=codes,
        categories=slot.categories[1:],
        multipliers=slot.multipliers,
        name=slot.name,
    )
    out.spans_intercept = getattr(slot, "spans_intercept", True)
    return out


# ----------------------------------------------------------------------
# slot → matrix conversion
# ----------------------------------------------------------------------


def _numeric_to_matrix(slot: NumericSlot, dtype, sparse_threshold):
    values = slot.values.astype(dtype)
    density = float(np.mean(values != 0)) if len(values) else 1.0
    if density > sparse_threshold:
        return DenseMatrix(values.reshape(-1, 1), column_names=[slot.name],
                           term_names=[slot.name])
    return SparseMatrix(
        sps.csc_matrix(values.reshape(-1, 1)),
        column_names=[slot.name],
        term_names=[slot.name],
    )


def _categorical_to_matrix(slot: CategoricalSlot, dtype, sparse_threshold, cat_threshold):
    """Convert, handling -2 drop sentinels via a synthetic dropped level."""
    codes = slot.codes.copy()
    categories = list(slot.categories)
    if (codes == -2).any():
        if (codes == -2).all():
            return SparseMatrix(
                sps.csc_matrix((len(codes), len(categories)), dtype=dtype),
                column_names=categories,
                term_names=[slot.name] * len(categories),
            )
        codes[codes >= 0] += 1
        codes[codes == -2] = 0
        categories = ["__drop__"] + categories
        drop_first = True
    else:
        drop_first = False

    cat = CategoricalMatrix(
        codes,
        categories=np.asarray(categories, dtype=object),
        drop_first=drop_first,
        dtype=dtype,
        column_name=slot.name,
        term_name=slot.name,
        column_name_format="{category}",
        cat_missing_method="zero",  # missing already handled upstream
    )
    if (slot.multipliers == 1).all() and cat.shape[1] >= cat_threshold:
        return cat

    scaled = sps.csc_matrix(
        cat.tocsr().multiply(slot.multipliers[:, np.newaxis]).astype(dtype)
    )
    dense_part, sparse_part, dense_idx, sparse_idx = _split_sparse_and_dense_parts(
        scaled,
        sparse_threshold,
        column_names=cat.get_names("column"),
        term_names=[slot.name] * cat.shape[1],
    )
    return SplitMatrix([dense_part, sparse_part], [dense_idx, sparse_idx])


# ----------------------------------------------------------------------
# the materializer
# ----------------------------------------------------------------------


@dataclass
class FormulaModelSpec:
    """Stateful formula spec: re-materialize new data with remembered levels."""

    formula: str
    terms: list = field(default_factory=list)
    intercept: bool = False
    factor_states: dict = field(default_factory=dict)
    options: dict = field(default_factory=dict)

    def get_model_matrix(self, data):
        """Encode ``data`` using this spec's remembered factor states."""
        return _materialize(
            self.terms,
            self.intercept,
            data,
            state=self.factor_states,
            use_state=True,
            spec=self,
            **self.options,
        )


def materialize_response(formula: str, data, context=None) -> np.ndarray:
    """Evaluate the left-hand side of ``lhs ~ rhs`` as a response vector."""
    from .parser import parse_formula

    lhs_terms, _, _ = parse_formula(formula)
    if not lhs_terms:
        raise ValueError(f"Formula {formula!r} has no left-hand side.")
    if len(lhs_terms) != 1 or lhs_terms[0].degree != 1:
        raise ValueError("The response must be a single term, e.g. 'y ~ ...'.")
    df = nw.from_native(data, eager_only=True)
    evaluator = _Evaluator(df, context, {}, use_state=False)
    slot = evaluator.eval_factor(lhs_terms[0].factors[0], "fail", "(MISSING)")
    if not isinstance(slot, NumericSlot):
        raise ValueError("The response must evaluate to a numeric vector.")
    return slot.values


def materialize_formula(
    formula: str,
    data,
    ensure_full_rank: bool = False,
    na_action: str = "ignore",
    dtype=np.float64,
    sparse_threshold: float = 0.1,
    cat_threshold: int = 4,
    interaction_separator: str = ":",
    categorical_format: str = "{name}[{category}]",
    cat_missing_method: str = "fail",
    cat_missing_name: str = "(MISSING)",
    intercept_name: str = "Intercept",
    include_intercept: bool = False,
    add_column_for_intercept: bool = True,
    context: Optional[dict] = None,
):
    """Parse + materialize a formula against a dataframe → SplitMatrix."""
    _, terms, intercept = parse_formula(formula, include_intercept)

    options = dict(
        ensure_full_rank=ensure_full_rank,
        na_action=na_action,
        dtype=dtype,
        sparse_threshold=sparse_threshold,
        cat_threshold=cat_threshold,
        interaction_separator=interaction_separator,
        categorical_format=categorical_format,
        cat_missing_method=cat_missing_method,
        cat_missing_name=cat_missing_name,
        intercept_name=intercept_name,
        add_column_for_intercept=add_column_for_intercept,
        context=context,
    )
    spec = FormulaModelSpec(
        formula=formula, terms=terms, intercept=intercept, options=options
    )
    return _materialize(
        terms,
        intercept,
        data,
        state=spec.factor_states,
        use_state=False,
        spec=spec,
        **options,
    )


def _materialize(
    terms,
    intercept,
    data,
    state,
    use_state,
    spec,
    ensure_full_rank=False,
    na_action="ignore",
    dtype=np.float64,
    sparse_threshold=0.1,
    cat_threshold=4,
    interaction_separator=":",
    categorical_format="{name}[{category}]",
    cat_missing_method="fail",
    cat_missing_name="(MISSING)",
    intercept_name="Intercept",
    add_column_for_intercept=True,
    context=None,
):
    if nw is None:
        raise ImportError("from_formula requires narwhals (or pandas).")
    df = nw.from_native(data, eager_only=True)
    evaluator = _Evaluator(df, context, state, use_state)

    # evaluate every distinct factor once
    factor_slots: dict[str, Any] = {}
    for term in terms:
        for f in term.factors:
            if f not in factor_slots:
                factor_slots[f] = evaluator.eval_factor(
                    f, cat_missing_method, cat_missing_name
                )

    n_rows = df.shape[0]

    # na_action over evaluated factors
    if na_action in ("drop", "raise"):
        na_mask = np.zeros(n_rows, dtype=bool)
        for slot in factor_slots.values():
            if isinstance(slot, CategoricalSlot):
                na_mask |= slot.codes == -1
            else:
                na_mask |= ~np.isfinite(slot.values)
        if na_mask.any():
            if na_action == "raise":
                raise ValueError("Missing values in formula data (na_action='raise').")
            keep = ~na_mask
            n_rows = int(keep.sum())
            for name, slot in factor_slots.items():
                if isinstance(slot, CategoricalSlot):
                    slot.codes = slot.codes[keep]
                    slot.multipliers = slot.multipliers[keep]
                else:
                    slot.values = slot.values[keep]

    # full-rank bookkeeping: the set of factor-subsets already spanned
    spanned: set[frozenset] = set()
    if intercept:
        spanned.add(frozenset())

    matrices = []
    term_names = []

    def _append(mat, term_label):
        # blocks are appended in consecutive column order; SplitMatrix
        # derives indices itself (handles nested splits from mixed-density
        # categorical encodings)
        matrices.append(mat)
        term_names.extend([term_label] * mat.shape[1])

    if intercept and add_column_for_intercept:
        ones = NumericSlot(np.ones(n_rows), intercept_name)
        _append(_numeric_to_matrix(ones, dtype, -1.0), intercept_name)

    for term in sorted(terms, key=lambda t: (t.degree,)):
        # encode each factor, deciding rank per the spanned-subset rule
        slots = []
        for f in term.factors:
            slot = factor_slots[f]
            if isinstance(slot, CategoricalSlot):
                rest = frozenset(set(term.factors) - {f})
                reduce_this = (
                    ensure_full_rank
                    and getattr(slot, "spans_intercept", True)
                    and rest in spanned
                )
                formatted = CategoricalSlot(
                    codes=slot.codes,
                    categories=[
                        categorical_format.format(name=f, category=c)
                        for c in slot.categories
                    ],
                    multipliers=slot.multipliers,
                    name=f,
                )
                formatted.spans_intercept = getattr(slot, "spans_intercept", True)
                slots.append(_reduce_rank(formatted) if reduce_this else formatted)
            else:
                slots.append(slot)
        combined = reduce(
            lambda a, b: interact(a, b, interaction_separator), slots
        )
        spanned.add(frozenset(term.factors))

        if isinstance(combined, NumericSlot):
            mat = _numeric_to_matrix(combined, dtype, sparse_threshold)
        else:
            mat = _categorical_to_matrix(
                combined, dtype, sparse_threshold, cat_threshold
            )
        _append(mat, term.name(interaction_separator))

    if not matrices:
        raise ValueError(f"Formula {spec.formula!r} produced no columns.")

    result = SplitMatrix(matrices)
    result.set_names(term_names, type="term")
    result.model_spec = spec
    return result

"""Column-level lineage extracted from the ANALYZED logical plan.

``column_lineage(df)`` answers "which source-relation columns feed
each output column?" — the governance/debug primitive behind impact
analysis ("who breaks if I drop events.value?") and selective
backfills. It works on Catalyst's own serialized plan
(``queryExecution().analyzed().toJSON()``), so it sees exactly what
the optimizer sees: every Alias edge, window expression, generator
(explode) output, and union branch — no SQL re-parsing, no
regex-on-explain.

Mechanics: the JSON is a flattened PRE-ORDER list of plan nodes
(``num-children`` encodes the tree), and each operator field that
holds expressions serializes them as nested flattened lists of
expression nodes carrying ``exprId``s. We build a dependency graph
attr-id → {attr-id} from three edge sources —

- ``Alias`` expression trees (projections, aggregates, window exprs):
  alias id depends on every ``AttributeReference`` in its subtree;
- ``Generate`` nodes: each generator-output attr depends on the
  generator's references (explode/posexplode/inline);
- ``Union`` nodes: output ids are the FIRST child's ids, which gain
  positional edges onto every other branch's ids;

— with leaf-relation output attrs as roots (their own column name),
then resolve transitively. Attributes that merely pass through
Filter/Join/Sort/... keep their exprId, so resolution terminates at
the owning leaf without per-operator rules.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

_ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
_ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"

# Logical nodes that run an opaque Python function over their child:
# their output attrs are FRESH ids declared on the node, and the only
# sound lineage is the coarse one — every output depends on every
# child output (the function may read anything it was handed).
_PY_MAP_NODES = frozenset(
    {
        "MapInPandas",
        "PythonMapInArrow",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInPandasWithState",
        "FlatMapCoGroupsInPandas",
        "TransformWithStateInPandas",
        "MapGroups",
        "MapElements",
    }
)


def _build_tree(nodes: list, i: int = 0):
    node = nodes[i]
    kids = []
    j = i + 1
    for _ in range(int(node.get("num-children", 0))):
        child, j = _build_tree(nodes, j)
        kids.append(child)
    return (node, kids), j


def _expr_trees(value):
    """Yield every flattened expression tree inside a field value."""
    if isinstance(value, list):
        if value and all(
            isinstance(x, dict) and "class" in x for x in value
        ):
            yield value
        else:
            for v in value:
                yield from _expr_trees(v)


def _attr_ids(tree: list) -> list[int]:
    return [
        n["exprId"]["id"]
        for n in tree
        if n.get("class") == _ATTR and "exprId" in n
    ]


def _tree_field(node: dict, name: str):
    v = node.get(name)
    return list(_expr_trees(v)) if v is not None else []


def _output_ids(node: dict, kids: list) -> list[int]:
    """Output attribute ids of a plan node (common operator rules +
    pass-through fallback)."""
    cls = node["class"].rsplit(".", 1)[-1]
    if not kids:  # leaf relation: 'output' holds its attributes
        return [
            t[0]["exprId"]["id"] for t in _tree_field(node, "output")
        ]
    if cls == "Project":
        return [
            t[0]["exprId"]["id"] for t in _tree_field(node, "projectList")
        ]
    if cls == "Aggregate":
        return [
            t[0]["exprId"]["id"]
            for t in _tree_field(node, "aggregateExpressions")
        ]
    if cls == "Window":
        return _output_ids(*kids[0]) + [
            t[0]["exprId"]["id"]
            for t in _tree_field(node, "windowExpressions")
        ]
    if cls == "Generate":
        base = _output_ids(*kids[0])
        gen = [
            t[0]["exprId"]["id"]
            for t in _tree_field(node, "generatorOutput")
        ]
        # requiredChildOutput may prune pass-through cols; keeping the
        # full child output only over-approximates, never misses
        return base + gen
    if cls in ("Join", "AsOfJoin"):
        return _output_ids(*kids[0]) + _output_ids(*kids[1])
    if cls in _PY_MAP_NODES:
        # Python-function nodes (mapInPandas / applyInPandas /
        # applyInPandasWithState / mapInArrow ...): fresh output attrs
        # declared in the 'output'/'outputAttrs' field
        for fname in ("output", "outputAttrs"):
            ids = [
                t[0]["exprId"]["id"] for t in _tree_field(node, fname)
            ]
            if ids:
                return ids
        return _output_ids(*kids[0])
    if cls in ("Union", "Intersect", "Except", "UnionLoop"):
        return _output_ids(*kids[0])
    if cls == "WithCTE":
        # children = [CTERelationDef..., main plan]; output is the
        # MAIN plan's, not the first definition's
        return _output_ids(*kids[-1])
    if cls == "Expand":
        return [
            t[0]["exprId"]["id"] for t in _tree_field(node, "output")
        ]
    # Filter / Sort / Limit / SubqueryAlias / Deduplicate / Repartition
    # / WithWatermark / ...: pass-through
    return _output_ids(*kids[0])


def _collect(node: dict, kids: list, edges: dict, roots: dict) -> None:
    for child in kids:
        _collect(*child, edges, roots)
    cls = node["class"].rsplit(".", 1)[-1]
    if not kids:
        for t in _tree_field(node, "output"):
            top = t[0]
            roots[top["exprId"]["id"]] = top.get("name", "?")
        return
    # Alias edges anywhere in this node's expression fields
    for field, value in node.items():
        if field in ("class", "num-children", "child", "children"):
            continue
        for t in _expr_trees(value):
            top = t[0]
            if top.get("class") == _ALIAS and "exprId" in top:
                tid = top["exprId"]["id"]
                edges.setdefault(tid, set()).update(
                    i for i in _attr_ids(t) if i != tid
                )
    if cls == "Generate":
        refs = set()
        for t in _tree_field(node, "generator"):
            refs.update(_attr_ids(t))
        for t in _tree_field(node, "generatorOutput"):
            tid = t[0]["exprId"]["id"]
            edges.setdefault(tid, set()).update(refs)
    if cls in _PY_MAP_NODES:
        # coarse edges: each fresh output attr <- every child output
        child_ids = set()
        for child in kids:
            child_ids.update(_output_ids(*child))
        for fname in ("output", "outputAttrs"):
            for t in _tree_field(node, fname):
                tid = t[0]["exprId"]["id"]
                edges.setdefault(tid, set()).update(
                    i for i in child_ids if i != tid
                )
    if cls in ("Union", "Intersect", "Except") and len(kids) > 1:
        first = _output_ids(*kids[0])
        for other in kids[1:]:
            for a, b in zip(first, _output_ids(*other)):
                if a != b:
                    edges.setdefault(a, set()).add(b)


def _resolve(i: int, edges: dict, roots: dict, memo: dict, seen: frozenset = frozenset()) -> set:
    if i in memo:
        return memo[i]
    if i in seen:  # defensive: serialized plans are acyclic
        return set()
    if i in roots and i not in edges:
        memo[i] = {roots[i]}
        return memo[i]
    out: set = set()
    if i in roots:
        out.add(roots[i])
    for d in edges.get(i, ()):
        out |= _resolve(d, edges, roots, memo, seen | {i})
    memo[i] = out
    return out


def column_lineage(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column of ``df`` to the sorted list of source
    leaf-relation column names it derives from (data lineage through
    projections, aggregates, windows, joins, explodes, and unions;
    literal-only columns map to [])."""
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
    (root, kids), _ = _build_tree(nodes)
    edges: dict = {}
    roots: dict = {}
    _collect(root, kids, edges, roots)
    out_ids = _output_ids(root, kids)
    memo: dict = {}
    return {
        name: sorted(_resolve(i, edges, roots, memo))
        for name, i in zip(df.columns, out_ids)
    }

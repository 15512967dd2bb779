"""Boolean query planner — the reference's prepare-time logical rewrites
(`core/search/boolean_filter.cpp`, SURVEY §4.1), applied driver-side
before any DataFrame is built. Catalyst handles everything below this
level (pushdown, pruning, join selection)."""

from __future__ import annotations

from iresearch_spark.search import ast


def normalize(node: ast.Node) -> ast.Node:
    """Apply the reference's rewrites bottom-up until fixpoint."""
    prev = None
    while prev != node:
        prev = node
        node = _rewrite(node)
    return node


def _rewrite(node: ast.Node) -> ast.Node:
    if isinstance(node, ast.Not):
        # double negation elimination (boolean_filter.cpp:35-55)
        child = _rewrite(node.child)
        if isinstance(child, ast.Not):
            return _apply_boost(child.child, node.boost * child.boost)
        return ast.Not(child, node.boost)

    if isinstance(node, ast.Should):
        child = _rewrite(node.child)
        # Empty does NOT propagate up through Should — an optional
        # clause matching nothing just scores nothing; the enclosing
        # And drops the wrapper below
        if isinstance(child, ast.Should):  # flatten nested optionals
            return ast.Should(child.child, node.boost * child.boost)
        if child is not node.child:
            return ast.Should(child, node.boost)
        return node

    if isinstance(node, ast.And):
        children = [_rewrite(c) for c in node.children]
        # a Should whose child rewrote to Empty is simply droppable —
        # an optional clause matching nothing scores nothing
        children = [
            c
            for c in children
            if not (isinstance(c, ast.Should) and isinstance(c.child, ast.Empty))
        ]
        # empty propagation: And(..., Empty) -> Empty (:146-148)
        if any(isinstance(c, ast.Empty) for c in children):
            return ast.Empty()
        # all-filter absorption (boolean_filter.cpp:158-210): collapse an
        # all-AllDocs conjunction to one AllDocs with summed boost. A
        # mixed group KEEPS its AllDocs children — their constant boost
        # contributes to the summed score (the reference folds that boost
        # into survivors; we keep the child and emit the constant).
        if all(isinstance(c, ast.AllDocs) for c in children):
            return ast.AllDocs(boost=node.boost * sum(c.boost for c in children))
        # pure-negation group: And(Not x, ...) with no positives ->
        # And(AllDocs, Not x ...) (:83-87,314-336)
        if all(isinstance(c, ast.Not) for c in children):
            children = [ast.AllDocs(boost=0.0)] + children
        # single-child flattening (:153-156; the reference also ignores
        # merge_type for the single-node case). A lone surviving Should
        # flattens to its child — Lucene's only-SHOULDs BooleanQuery is
        # min_match=1 over the shoulds.
        if len(children) == 1 and not isinstance(children[0], ast.Not):
            only = children[0]
            if isinstance(only, ast.Should):
                return _apply_boost(only.child, node.boost * only.boost)
            return _apply_boost(only, node.boost)
        return ast.And(children, node.boost, node.merge_type)

    if isinstance(node, ast.Or):
        children = [_rewrite(c) for c in node.children]
        # Or drops Empty children (:232-240)
        children = [c for c in children if not isinstance(c, ast.Empty)]
        positives = [c for c in children if not isinstance(c, ast.Not)]
        n = len(positives)
        if n == 0:
            # an Or of only negations matches nothing — the reference
            # returns prepared::empty() when incl is empty (:254-257)
            return ast.Empty()
        mm = node.min_match
        # min-match specialization over POSITIVES (:213-220,287-312):
        # exclusions don't count toward min_match
        if mm > n:
            return ast.Empty()  # unsatisfiable
        if mm <= 0:
            # min_match=0 matches everything (reference: `all`)
            return ast.Or([ast.AllDocs()] + children, 1, node.boost,
                          node.merge_type)
        if len(children) == 1 and not isinstance(children[0], ast.Not):
            return _apply_boost(children[0], node.boost)
        if mm == n:
            return ast.And(children, node.boost, node.merge_type)
        return ast.Or(children, mm, node.boost, node.merge_type)

    if isinstance(node, (ast.Nested, ast.Cached, ast.Field)):
        import dataclasses

        child = _rewrite(node.child)
        if isinstance(child, ast.Empty):
            return ast.Empty()
        if child is not node.child:
            return dataclasses.replace(node, child=child)
        return node

    if isinstance(node, ast.Terms) and (
        node.min_match > 1 or node.merge_type != "sum"
    ):
        # by_terms min_match / merge_type (terms_filter.hpp:63-67) ride
        # the boolean Or machinery; per-term boosts fold into the kids
        return ast.Or(
            [ast.Term(t, node.term_boost(t)) for t in dict.fromkeys(node.terms)],
            min_match=node.min_match,
            boost=node.boost,
            merge_type=node.merge_type,
        )

    if isinstance(node, ast.Terms) and len(node.terms) == 1:
        t = node.terms[0]
        return ast.Term(t, node.boost * node.term_boost(t))

    if (
        isinstance(node, (ast.Phrase, ast.SamePosition))
        and len(node.terms) == 1
        and isinstance(node.terms[0], str)
    ):
        return ast.Term(node.terms[0], node.boost)

    return node


def _apply_boost(node: ast.Node, boost: float) -> ast.Node:
    if boost == 1.0:
        return node
    import dataclasses

    return dataclasses.replace(node, boost=node.boost * boost)

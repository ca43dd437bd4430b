"""README API index drift gate (VERDICT r9 item 8): the index is
GENERATED from the package's __all__ surface and the driver queries'
imports (`scripts/gen_api_index.py`); this test regenerates it and
fails if README.md has drifted from the code — new public callables,
removed queries, renamed modules all trip it."""

import importlib.util
import os
import re


def _load_gen():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api_index", os.path.join(root, "scripts", "gen_api_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return root, mod


def test_readme_api_index_is_current():
    root, gen = _load_gen()
    readme = open(os.path.join(root, "README.md")).read()
    block = gen.render()
    pattern = re.compile(re.escape(gen.BEGIN) + ".*?" + re.escape(gen.END), re.S)
    m = pattern.search(readme)
    assert m, "README.md has no API-INDEX block — run scripts/gen_api_index.py"
    assert m.group(0) == block, (
        "README API index is stale — run scripts/gen_api_index.py"
    )


def test_api_index_covers_the_surface():
    """Structural floor: the index lists every __all__ callable and
    maps a substantial majority of them to at least one driver query."""
    _, gen = _load_gen()
    calls = gen.public_callables()
    usage = gen.query_usage()
    assert len(calls) >= 250
    linked = sum(1 for _, (m, n, d) in calls.items() if usage.get(n))
    assert linked / len(calls) >= 0.6, (linked, len(calls))


def test_usage_matching_ignores_docstrings():
    """A callable mentioned only in a _q_* docstring (prose like
    'pack_examples(...)') must NOT be credited as exercised by that
    query — the bare-name regex runs on the docstring-stripped body
    (r10 advisor finding)."""
    _, gen = _load_gen()

    import __spark_entry__ as entry
    import inspect

    usage = gen.query_usage()
    hits = 0
    import ast
    import re as _re
    import textwrap

    for qname, fn in entry.queries().items():
        src = inspect.getsource(fn)
        # strip the docstring the same way gen_api_index does — an
        # inspect.getdoc + str.replace probe never matches the
        # INDENTED multi-line source, leaving the docstring in the
        # body and making the check vacuous (review r11)
        tree = ast.parse(textwrap.dedent(src))
        fdef = tree.body[0]
        if (
            fdef.body
            and isinstance(fdef.body[0], ast.Expr)
            and isinstance(fdef.body[0].value, ast.Constant)
            and isinstance(fdef.body[0].value.value, str)
        ):
            fdef.body = fdef.body[1:] or [ast.Pass()]
        body = ast.unparse(fdef)
        for tok, queries in usage.items():
            if qname in queries:
                # every credit must be visible OUTSIDE the docstring
                ok = (
                    _re.search(rf"\b{_re.escape(tok)}\b", body) is not None
                )
                assert ok, (
                    f"{qname} credited with {tok} but it appears only "
                    "in the docstring"
                )
                hits += 1
    assert hits > 100  # the matcher still links a real surface

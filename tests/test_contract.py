"""Driver-contract consistency: the shapes the external driver relies on."""

import inspect


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"
    assert len(qs) >= 40 and len(sqls) >= 20


def test_no_ray_init_in_contract_module():
    """The driver owns the Ray session; the contract module must never
    call ray.init/shutdown (it would clobber the driver's session)."""
    import ast

    import __ray_entry__ as E

    tree = ast.parse(inspect.getsource(E))
    calls = [
        node.func.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    ]
    assert "init" not in calls or not any(
        isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr in ("init", "shutdown")
        and isinstance(n.func.value, ast.Name)
        and n.func.value.id == "ray"
        for n in ast.walk(tree)
    )


def test_query_callables_take_sf_dir():
    import __ray_entry__ as E

    for name, fn in E.queries().items():
        sig = inspect.signature(fn)
        required = [
            p for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        assert len(required) == 1, f"{name} must take exactly sf_dir, got {sig}"


def test_email_pattern_in_sync():
    """oracle_sql's _EMAIL must stay byte-identical to the engine's
    EMAIL_PATTERN (duplicated at module scope for the SQL f-string)."""
    import __ray_entry__ as E
    from kire_ray.pipelines.text_analysis import EMAIL_PATTERN

    assert E._EMAIL == EMAIL_PATTERN

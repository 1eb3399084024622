"""Guards the __ray_entry__ driver contract: entry() smoke, registry
integrity, no ray.init anywhere in the call path (the driver owns Ray)."""

import inspect


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert list(df.columns) == ["doc_id", "pages", "status", "error", "n_spans", "markdown"]


def test_registry_integrity(ray_session):
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert len(qs) >= 40
    assert set(osql) <= set(qs)
    assert len(osql) >= 25
    for name, fn in qs.items():
        assert callable(fn), name
        assert len(inspect.signature(fn).parameters) == 1, name


def test_library_never_inits_ray():
    # the driver calls ray.init itself; the library must not (bench.py,
    # job.py and tests own their sessions — those are entry points)
    import pathlib
    import re

    root = pathlib.Path(__file__).parent.parent / "docling_api_ray"
    offenders = []
    for p in root.rglob("*.py"):
        if p.name == "job.py":  # CLI entry point owns its session
            continue
        src = p.read_text()
        if re.search(r"ray\.init\(", src):
            offenders.append(str(p))
    assert not offenders, offenders

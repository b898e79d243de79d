"""Top-level API surface: every lazy re-export in qasr/__init__.py resolves."""

import qasr


def test_all_exports_resolve():
    for name in qasr.__all__:
        assert getattr(qasr, name) is not None


def test_unknown_attribute_raises():
    import pytest

    with pytest.raises(AttributeError):
        qasr.no_such_symbol


def test_dir_matches_all():
    assert set(qasr.__all__) <= set(dir(qasr))

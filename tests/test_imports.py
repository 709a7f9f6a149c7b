"""Package integrity: every module imports, every ``__all__`` name resolves,
and every registry entry exposes the (init, build_kernel) surface."""
import importlib
import pkgutil
import warnings

import pytest

import blackjax_tpu


def _iter_modules():
    prefix = blackjax_tpu.__name__ + "."
    for mod in pkgutil.walk_packages(blackjax_tpu.__path__, prefix):
        yield mod.name


@pytest.mark.parametrize("name", sorted(_iter_modules()))
def test_module_imports(name):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        module = importlib.import_module(name)
    for attr in getattr(module, "__all__", []):
        assert hasattr(module, attr), f"{name}.__all__ lists missing {attr!r}"


def test_top_level_all_resolves():
    for attr in blackjax_tpu.__all__:
        assert hasattr(blackjax_tpu, attr), attr


def test_registry_objects_expose_module_surface():
    from blackjax_tpu import GenerateSamplingAPI

    registries = [
        name
        for name in blackjax_tpu.__all__
        if isinstance(getattr(blackjax_tpu, name), GenerateSamplingAPI)
    ]
    assert len(registries) >= 20  # the sampler families are all registered
    for name in registries:
        obj = getattr(blackjax_tpu, name)
        assert callable(obj.init) and callable(obj.build_kernel), name

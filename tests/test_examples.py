"""Import-smoke tests for every example (the reference builds all examples
with -Werror in CI, build_and_test.yml:55; importing each module catches API
bitrot without paying for the full closed-loop runs, which the benchmarks
cover)."""

import importlib.util
import pathlib

import pytest

EXAMPLES = sorted((pathlib.Path(__file__).parent.parent / "examples").glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __name__ != "__main__": main() not run
    assert hasattr(mod, "main"), f"{path.name} has no main()"

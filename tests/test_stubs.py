"""The typing stub (piqp_tpu/__init__.pyi, analog of the reference's
interfaces/python/piqp/__init__.pyi) must stay consistent with the runtime
API: every stubbed symbol exists, every stubbed dataclass attribute is a
real field, and every public __all__ name is stubbed."""

import ast
import dataclasses
import inspect
import os

import piqp_tpu

STUB = os.path.join(os.path.dirname(piqp_tpu.__file__), "__init__.pyi")


def _stub_tree():
    with open(STUB) as f:
        return ast.parse(f.read())


def _stub_names(tree):
    names = {}
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef)):
            names[node.name] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            names[node.target.id] = node
    return names


def test_all_public_names_are_stubbed():
    names = _stub_names(_stub_tree())
    missing = [n for n in piqp_tpu.__all__ if n not in names]
    assert not missing, f"public names missing from __init__.pyi: {missing}"


def test_stubbed_symbols_exist_at_runtime():
    names = _stub_names(_stub_tree())
    missing = [n for n in names if not hasattr(piqp_tpu, n)]
    assert not missing, f"stubbed names absent at runtime: {missing}"


def test_stubbed_dataclass_attrs_are_real_fields():
    tree = _stub_tree()
    problems = []
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        cls = getattr(piqp_tpu, node.name, None)
        if cls is None or not dataclasses.is_dataclass(cls):
            continue
        fields = {f.name for f in dataclasses.fields(cls)}
        for item in node.body:
            if isinstance(item, ast.AnnAssign) and isinstance(
                item.target, ast.Name
            ):
                attr = item.target.id
                if attr not in fields and not hasattr(cls, attr):
                    problems.append(f"{node.name}.{attr}")
    assert not problems, f"stubbed attrs not present on runtime class: {problems}"


def test_stubbed_methods_exist():
    tree = _stub_tree()
    problems = []
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        cls = getattr(piqp_tpu, node.name, None)
        if cls is None or not inspect.isclass(cls):
            continue
        for item in node.body:
            if isinstance(item, ast.FunctionDef) and not hasattr(
                cls, item.name
            ):
                problems.append(f"{node.name}.{item.name}")
    assert not problems, f"stubbed methods absent at runtime: {problems}"

"""dbt packages — the `dbt deps` surface (X85, VERDICT r10 "What's
missing" #4).

dbt projects declare dependencies in ``packages.yml`` (or, since
dbt-core 1.6, ``dependencies.yml``) and ``dbt deps`` installs each one
— itself a full dbt project with its own ``dbt_project.yml``, macros,
models, seeds — under ``packages-install-path`` (default
``dbt_packages/``).  The reference README points users at the dbt
package workflow (`/root/reference/README.md:44-45`; no packages.yml
ships there).

This engine has no network and no installer, so the DISCOVERY contract
is:

  * ``local:`` entries resolve relative to the project dir and are read
    IN PLACE (dbt's local packages are symlinked; same effect).
  * any directory already present under ``packages-install-path`` that
    contains a ``dbt_project.yml`` counts as installed (the vendored
    form of a hub/git install — check the files in, exactly what a
    hermetic CI does).
  * ``package:`` (hub) and ``git:`` entries RAISE with the vendoring
    instruction — a silent skip would drop the package's macros and
    models, and guessing a network fetch is out of scope by design.

Packages load in deterministic name order.  dbt's config precedence is
preserved where the surfaces meet: the ROOT project's ``models:
<package>:`` tree overrides the package's own policy tree, root
``vars:`` override package vars, and a root ``vars: {<package>: {...}}``
scoped block wins over both for that package's models.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class PackageRef:
    """One installed package: its declared name, its root directory, and
    its parsed dbt_project.yml."""
    name: str
    path: str
    cfg: dict


def _read_project_yml(path: str, origin: str) -> dict:
    import yaml

    proj = os.path.join(path, "dbt_project.yml")
    if not os.path.isfile(proj):
        raise ValueError(
            f"{origin}: {path!r} is not a dbt project "
            "(no dbt_project.yml)")
    with open(proj) as fh:
        cfg = yaml.safe_load(fh) or {}
    if "name" not in cfg:
        raise ValueError(f"{origin}: {proj} has no `name:`")
    return cfg


def discover_packages(project_dir: str, cfg: dict) -> list[PackageRef]:
    """Every installed package of a project: declared ``local:`` entries
    plus whatever is vendored under ``packages-install-path``.  Returns
    them sorted by package name; duplicate names (a local: entry AND a
    vendored copy, or two packages declaring the same name) raise —
    dbt's namespace is flat and silently preferring one copy would be a
    guess."""
    import yaml

    entries: list[str] = []  # package root dirs, pre-name-resolution
    decl_path = None
    for fname in ("packages.yml", "dependencies.yml"):
        p = os.path.join(project_dir, fname)
        if not os.path.isfile(p):
            continue
        with open(p) as fh:
            doc = yaml.safe_load(fh) or {}
        if not doc.get("packages"):
            continue
        if decl_path is not None:
            # dbt-core errors when both files declare packages
            raise ValueError(
                f"both {os.path.basename(decl_path)} and {fname} declare "
                "packages: — keep one")
        decl_path = p
        for item in doc["packages"]:
            if not isinstance(item, dict):
                raise ValueError(f"{fname}: malformed entry {item!r}")
            if "local" in item:
                entries.append(
                    os.path.normpath(
                        os.path.join(project_dir, item["local"])))
            elif "package" in item or "git" in item:
                want = item.get("package") or item.get("git")
                raise ValueError(
                    f"{fname}: {want!r} needs a network install — this "
                    "engine has no installer; vendor the package under "
                    "packages-install-path (default dbt_packages/) or "
                    "point a local: entry at a checkout")
            else:
                raise ValueError(
                    f"{fname}: entry {item!r} has none of "
                    "local:/package:/git:")

    install_path = os.path.join(
        project_dir, cfg.get("packages-install-path", "dbt_packages"))
    if os.path.isdir(install_path):
        for d in sorted(os.listdir(install_path)):
            full = os.path.join(install_path, d)
            if os.path.isdir(full) and os.path.isfile(
                    os.path.join(full, "dbt_project.yml")):
                entries.append(full)

    out: dict[str, PackageRef] = {}
    root_name = cfg.get("name")
    for path in entries:
        pkg_cfg = _read_project_yml(path, origin="packages")
        pname = pkg_cfg["name"]
        if pname == root_name:
            raise ValueError(
                f"package at {path!r} declares the root project's own "
                f"name {pname!r}")
        if pname in out:
            if os.path.realpath(out[pname].path) == os.path.realpath(path):
                continue  # same checkout reached twice (local: + vendored
                # symlink) — harmless
            raise ValueError(
                f"package name {pname!r} found at both "
                f"{out[pname].path!r} and {path!r} — flat namespace, "
                "keep one")
        out[pname] = PackageRef(pname, path, pkg_cfg)
    return [out[k] for k in sorted(out)]

"""Simulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), run every query at sf0.01 vs duckdb oracle.

Uses tests.oracle.compare — the single dtype-sensitive comparison (the
r8 HUGEINT escape shipped because this script kept its own dtype-blind
copy of the check; it must never diverge from the pytest harness again).

Usage:
    python scripts/drive_driver.py                  # full drive (~25 min)
    python scripts/drive_driver.py q1 q2 ...        # named queries only
    python scripts/drive_driver.py --changed-since REF [names...]
        # queries whose defining module — or any package module it
        # (transitively) imports, resolved from the AST so lazy
        # in-function imports count — differs from git REF; union'd
        # with any explicitly named queries. Targeted verification as
        # the default during a round; the full drive still runs once
        # per round before shipping.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from tests.oracle import compare, duckdb_connection

PKG = "automate_data_ingestion_project_spark"


def _changed_package_modules(ref: str) -> set[str]:
    """Package module names whose files differ from ``ref`` (committed
    diffs + untracked files)."""
    import subprocess

    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "*.py"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.splitlines()
    out += [
        ln[3:]
        for ln in subprocess.run(
            ["git", "status", "--porcelain", "--", "*.py"],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        ).stdout.splitlines()
        if ln.startswith("??")
    ]
    mods = set()
    for path in out:
        if not path.startswith(PKG + "/") or not path.endswith(".py"):
            continue
        mod = path[:-3].replace("/", ".")
        mods.add(mod[: -len(".__init__")] if mod.endswith(".__init__") else mod)
    return mods


def _module_imports(mod_name: str, cache: dict) -> set[str]:
    """Package modules imported ANYWHERE in ``mod_name``'s source
    (module level or inside functions), via the AST — lazy in-function
    imports are this repo's idiom, so a runtime-namespace scan would
    miss most edges."""
    import ast
    import importlib.util

    if mod_name in cache:
        return cache[mod_name]
    cache[mod_name] = set()  # cycle guard
    spec = importlib.util.find_spec(mod_name)
    if spec is None or not spec.origin or not spec.origin.endswith(".py"):
        return set()
    with open(spec.origin, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    pkg_parts = mod_name.split(".")
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            found.update(a.name for a in node.names if a.name.startswith(PKG))
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this module
                base = ".".join(pkg_parts[: len(pkg_parts) - node.level])
                mod = f"{base}.{node.module}" if node.module else base
            else:
                mod = node.module or ""
            if mod.startswith(PKG):
                found.add(mod)
                for a in node.names:
                    # `from X import name` may name a submodule of X;
                    # find_spec raises (not returns None) when X is a
                    # plain module with no __path__
                    try:
                        if importlib.util.find_spec(f"{mod}.{a.name}"):
                            found.add(f"{mod}.{a.name}")
                    except ModuleNotFoundError:
                        pass
    cache[mod_name] = found
    return found


def _import_closure(mod_name: str, cache: dict) -> set[str]:
    seen, todo = set(), [mod_name]
    while todo:
        m = todo.pop()
        if m in seen:
            continue
        seen.add(m)
        todo.extend(_module_imports(m, cache))
    return seen


spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# smoke
df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

SF = "/root/testdata/sf0.01"
con = duckdb_connection(SF)

args = sys.argv[1:]
only = set()
if "--changed-since" in args:
    i = args.index("--changed-since")
    ref = args[i + 1]
    only = set(args[:i] + args[i + 2 :])
    changed = _changed_package_modules(ref)
    cache: dict = {}
    auto = {
        name
        for name, fn in E.queries().items()
        if changed & _import_closure(fn.__module__, cache)
    }
    print(
        f"--changed-since {ref}: {len(changed)} changed package modules "
        f"-> {len(auto)} affected queries"
    )
    only |= auto
    if not only:
        print("nothing affected; exiting green")
        sys.exit(0)
else:
    only = set(args)  # optional: restrict to named queries
qs, oracles = E.queries(), E.oracle_sql()
unknown = only - set(qs)
if unknown:
    # a typo here would run ZERO comparisons and exit 0 — a fake green
    # on the exact gate this script exists to provide
    print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
    sys.exit(2)
fails = []
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    sdf = fn(spark, SF)
    if name not in oracles:
        print(f"{name}: rows-only, {sdf.count()} rows")
        continue
    rep = compare(sdf, con, oracles[name])
    status = "OK" if rep["ok"] else "MISMATCH"
    print(
        f"{name}: {status} spark={rep['spark_rows']} duck={rep['duck_rows']} "
        f"cols_ok={rep['cols_ok']} types_ok={rep['types_ok']} vals_ok={rep['values_ok']}"
    )
    if not rep["ok"]:
        fails.append(name)
        if rep["type_mismatches"]:
            print("   types:", rep["type_mismatches"])
        for a, b in rep.get("first_diffs", [])[:3]:
            print("   spark:", a, "\n   duck :", b)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)

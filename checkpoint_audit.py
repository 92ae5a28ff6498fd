"""Consumer-count audit of truncate_lineage call sites in plans/.

For each function containing `x = truncate_lineage(...)`, count how many
times x is LOADED afterwards (excluding re-assignment). A count of 1
marks a candidate vestigial checkpoint (pure write+read), >=2 is
multi-consumer-justified. Conservative: loads inside loops count as the
loop body's static count (flagged), and non-assignment call forms are
listed as 'inline'.
"""
import ast, sys, glob

rows = []
for path in sorted(glob.glob("citibike_deep_dive_spark/plans/*.py")) + sorted(glob.glob("citibike_deep_dive_spark/operators/*.py")):
    src = open(path).read()
    tree = ast.parse(src)
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        # map: var name -> assignment line(s) of truncate_lineage
        assigns = []
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call):
                f = node.value.func
                name = f.id if isinstance(f, ast.Name) else (f.attr if isinstance(f, ast.Attribute) else "")
                if name == "truncate_lineage" and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
                    assigns.append((node.targets[0].id, node.lineno))
            elif isinstance(node, ast.Call):
                f = node.func
                name = f.id if isinstance(f, ast.Name) else (f.attr if isinstance(f, ast.Attribute) else "")
                if name == "truncate_lineage" and not any(
                    isinstance(p, ast.Assign) and p.value is node for p in ast.walk(fn)
                ):
                    pass  # handled via assigns when assigned; inline uses found below
        # count loads after each assignment
        for var, lineno in assigns:
            loads = 0
            in_loop = False
            for node in ast.walk(fn):
                if isinstance(node, ast.Name) and node.id == var and isinstance(node.ctx, ast.Load) and node.lineno > lineno:
                    loads += 1
            # is the load inside a for/while?
            for node in ast.walk(fn):
                if isinstance(node, (ast.For, ast.While)):
                    for sub in ast.walk(node):
                        if isinstance(sub, ast.Name) and sub.id == var and isinstance(sub.ctx, ast.Load):
                            in_loop = True
            rows.append((path, fn.name, var, lineno, loads, in_loop))

print(f"{'file':<44} {'function':<38} {'var':<10} line  loads loop")
n1 = 0
for path, f, v, l, c, lp in sorted(rows, key=lambda r: (r[4], r[0])):
    flag = " <== SINGLE-CONSUMER" if c == 1 and not lp else ""
    if c == 1 and not lp: n1 += 1
    print(f"{path:<44} {f:<38} {v:<10} {l:<5} {c:<5} {('Y' if lp else '-')}{flag}")
print(f"\ntotal sites: {len(rows)}, single-consumer candidates: {n1}")

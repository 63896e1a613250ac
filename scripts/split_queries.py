"""One-shot splitter: vectorflow_spark/queries.py -> vectorflow_spark/queries/ package.

Slices the monolith at its section-header boundaries, assigns each section to a
family module, computes cross-module top-level name references with ast, and
emits modules whose explicit imports preserve the original single-namespace
semantics. Run once; kept for the record."""

from __future__ import annotations

import ast
import os
from collections import OrderedDict

SRC = "/root/repo/vectorflow_spark/queries.py"
PKG = "/root/repo/vectorflow_spark/queries"

# section text-header line -> module (dash line is text-1; slice runs to next dash-1)
SECTIONS = [
    (78, "pipeline"), (154, "pipeline"), (270, "pipeline"), (295, "pipeline"),
    (376, "pipeline"), (443, "similarity"), (484, "dedup"), (700, "similarity"),
    (865, "text"), (959, "pipeline"), (992, "relational"), (1205, "multimodal"),
    (1471, "temporal"), (1796, "pipeline"), (2121, "relational"), (2645, "curation"),
    (3967, "tpch"), (4288, "events"), (4771, "tpch"), (5246, "analytics"),
    (5435, "analytics"), (5678, "analytics"), (5935, "analytics"), (6076, "analytics"),
    (6221, "analytics"), (6369, "analytics2"), (6533, "analytics2"), (6668, "analytics2"),
    (6799, "analytics2"), (7357, "lines"), (8116, "formats"),
]

MODULE_DOC = {
    "pipeline": "Reference-pipeline parity: scans, chunkers, ids, joins/sinks, rollups, enrichment, token chunk declarations (SURVEY §2 S/C/K/F/U/A/L groups).",
    "similarity": "Similarity search / ANN: top-K cosine, LSH, IVF, kNN, PQ, rerank (X2 family).",
    "dedup": "Deduplication family: exact, MinHash/LSH, SimHash, n-gram Jaccard, embedding near-dup (X4 + extensions).",
    "text": "Text analysis: token stats, language id, quality scores, enrichment text ops.",
    "relational": "Relational coverage on the TPC-H-ish tables: pricing, top-N, windows, multi-join shapes, distinct aggregation.",
    "multimodal": "Sources / multimodal metadata / sessionization.",
    "temporal": "Temporal & relational extensions: as-of joins, anti joins, set ops, rollup/cube.",
    "curation": "Training-data curation: repetition, rule filters, PII, decontamination, sampling.",
    "tpch": "TPC-H query-shape coverage (Q2..Q22 equivalents).",
    "events": "Event analytics: SCD2, graph stats, entropy, sketches, sessionization windows.",
    "analytics": "Analytics batches: ranking, grouping sets, quantiles, cohorts, histograms, HH sketches.",
    "analytics2": "Analytics batches: funnels, ratio-to-report, YoY, MAD, quantile/correlation exactness, containment near-dup.",
    "lines": "Line-level cleaning + corpus curation extensions (CCNet-style).",
    "formats": "Format gates: encode->extract roundtrips, WARC/WebDataset/codec scan queries.",
}

lines = open(SRC).read().splitlines(keepends=True)
n = len(lines)

# core = everything before the first section dash line
core_end = SECTIONS[0][0] - 2  # 1-based line before first dash line
slices = []  # (module, start_1based, end_1based)
for i, (txt_line, mod) in enumerate(SECTIONS):
    start = txt_line - 1  # dash line
    end = (SECTIONS[i + 1][0] - 2) if i + 1 < len(SECTIONS) else n
    slices.append((mod, start, end))

core_src = "".join(lines[:core_end])


def top_defs(src: str) -> set[str]:
    out = set()
    tree = ast.parse(src)
    for s in tree.body:
        if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.add(s.name)
        elif isinstance(s, ast.Assign):
            for t in s.targets:
                if isinstance(t, ast.Name):
                    out.add(t.id)
        elif isinstance(s, ast.AnnAssign) and isinstance(s.target, ast.Name):
            out.add(s.target.id)
        elif isinstance(s, (ast.Import, ast.ImportFrom)):
            for a in s.names:
                out.add((a.asname or a.name).split(".")[0])
    return out


def refs(src: str) -> set[str]:
    return {nd.id for nd in ast.walk(ast.parse(src)) if isinstance(nd, ast.Name)}


core_defs = top_defs(core_src)

# header import statements of the monolith, alias -> source line
header_tree = ast.parse(core_src)
import_stmts = []  # (aliases, src)
for s in header_tree.body:
    if isinstance(s, (ast.Import, ast.ImportFrom)):
        aliases = {(a.asname or a.name).split(".")[0] for a in s.names}
        import_stmts.append((aliases, ast.get_source_segment(core_src, s)))

# module -> ordered source text; and per-slice def/ref bookkeeping in file order
mod_src: "OrderedDict[str, list[str]]" = OrderedDict()
slice_info = []  # (mod, defs, refs)
for mod, a, b in slices:
    src = "".join(lines[a - 1 : b])
    mod_src.setdefault(mod, []).append(src)
    slice_info.append((mod, top_defs(src), refs(src)))

# name -> defining module, walking file order; detect forward references
owner: dict[str, str] = {}
for mod, defs, _ in slice_info:
    for d in defs:
        owner.setdefault(d, mod)

forward = []
seen_defs: set[str] = set(core_defs)
for mod, defs, rr in slice_info:
    for r in rr:
        if r not in seen_defs and r in owner and owner[r] != mod:
            forward.append((mod, r, owner[r]))
    seen_defs |= defs
if forward:
    print("FORWARD REFS (need manual handling):")
    for f in sorted(set(forward)):
        print("  ", f)

# per-module aggregate defs/refs
mod_defs: dict[str, set[str]] = {}
mod_refs: dict[str, set[str]] = {}
for mod, defs, rr in slice_info:
    mod_defs.setdefault(mod, set()).update(defs)
    mod_refs.setdefault(mod, set()).update(rr)

mod_order = list(mod_src)
print("module order:", mod_order)

# detect inter-module cycles under "import what you reference"
deps = {
    m: {owner[r] for r in mod_refs[m] if r in owner and owner[r] != m}
    for m in mod_order
}
for m, ds in deps.items():
    for d in ds:
        if m in deps.get(d, set()):
            print(f"CYCLE: {m} <-> {d}")

if os.environ.get("EMIT") != "1":
    for m in mod_order:
        cross = sorted(r for r in mod_refs[m] if r in owner and owner[r] != m)
        print(f"{m}: {sum(len(s) for s in mod_src[m])} chars, cross-refs {cross}")
    raise SystemExit(0)

os.makedirs(PKG, exist_ok=True)
with open(f"{PKG}/_core.py", "w") as f:
    f.write(core_src)

for m in mod_order:
    body = "".join(mod_src[m])
    rr = mod_refs[m]
    hdr = [f'"""{MODULE_DOC[m]}"""\n', "\n", "from __future__ import annotations\n", "\n"]
    for aliases, src in import_stmts:
        if aliases & rr:
            hdr.append(src + "\n")
    core_needed = sorted(core_defs & rr - mod_defs[m] - {a for al, _ in import_stmts for a in al})
    if core_needed:
        hdr.append(f"from vectorflow_spark.queries._core import {', '.join(core_needed)}\n")
    by_mod: dict[str, list[str]] = {}
    for r in sorted(rr):
        if r in owner and owner[r] != m and r not in mod_defs[m]:
            by_mod.setdefault(owner[r], []).append(r)
    for om in mod_order:
        if om in by_mod:
            hdr.append(f"from vectorflow_spark.queries.{om} import {', '.join(by_mod[om])}\n")
    with open(f"{PKG}/{m}.py", "w") as f:
        f.write("".join(hdr) + "\n\n" + body)

init = [
    '"""Driver-contract queries, split per family; importing this package',
    "registers every query in QUERIES/ORACLE (see _core for the registry and",
    'the correctness discipline notes)."""',
    "",
    "from vectorflow_spark.queries._core import ORACLE, QUERIES, _t, query",
    "",
]
for m in mod_order:
    init.append(f"from vectorflow_spark.queries import {m} as _{m}  # noqa: E402,F401")
init += [
    "",
    "# legacy re-exports used by tests",
    f"from vectorflow_spark.queries.{owner['_C1_SQL']} import _C1_SQL, _C3_SQL, _C4_SQL, _C5_SQL  # noqa: E402",
    f"from vectorflow_spark.queries.{owner['_bow_weights']} import _bow_weights  # noqa: E402",
    "",
    '__all__ = ["ORACLE", "QUERIES", "_t", "query"]',
    "",
]
with open(f"{PKG}/__init__.py", "w") as f:
    f.write("\n".join(init))
print("emitted", mod_order)

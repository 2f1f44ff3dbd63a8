"""One-shot mechanical splitter: queries.py (40k lines) -> queries/ package.

Round-13 verdict item 2. Splits the single module at its existing
`# ===` family-section boundaries into per-family submodules behind the
unchanged CATALOG registry; `queries/__init__.py` imports every family
module in the original order and hoists each module's top-level names
into the package namespace, so every external importer
(`from ...queries import CATALOG / t / flagship / _AO_W / ...`) keeps
working byte-identically.  Run once from the repo root, then delete.
"""

from __future__ import annotations

import ast
import builtins
import collections
import os

SRC = "real_estate_data_pipeline_spark/queries.py"
PKG = "real_estate_data_pipeline_spark/queries"

# (start_line_1based, module_name).  Chunk 0 is the registry prelude;
# boundaries are the existing `# ===` family headers (plus three
# register-block cuts inside the header-less r12 wave 8-20 tail).
CHUNKS = [
    (1, "_registry"),
    (179, "q01_aggregations"),
    (364, "q02_filters_projections"),
    (475, "q03_joins"),
    (563, "q04_dedup_topk_union"),
    (642, "q05_tpch_headliners"),
    (731, "q06_scalar_functions"),
    (1036, "q07_nested"),
    (1162, "q08_event_windows"),
    (1301, "q09_llm_dedup_text_sim"),
    (2535, "q10_coverage_misc"),
    (3645, "q11_window_analytics"),
    (3994, "q12_asof_range"),
    (4125, "q13_doc_cleanse"),
    (4180, "q14_tpch_deep"),
    (4895, "q15_curation_r3"),
    (8408, "q16_curation_r4"),
    (11676, "q17_flagship"),
    (11698, "q18_r7_timeseries"),
    (12287, "q19_r7_graph"),
    (12650, "q20_r7_language_models"),
    (13436, "q21_r7_retrieval"),
    (13964, "q22_r7_lakehouse"),
    (14363, "q23_r7_bi"),
    (14789, "q24_r7_distribution_diag"),
    (15122, "q25_r7_inference"),
    (17856, "q26_r8_mixed"),
    (20228, "q27_r9_retrieval"),
    (20635, "q28_r9_sketch_vocab"),
    (20863, "q29_r9_rank_stats"),
    (21210, "q30_r9_robust_ml"),
    (21562, "q31_r9_wave2_rank_embed"),
    (22338, "q32_r10_effect_sizes"),
    (23191, "q33_r10_inequality_resampling"),
    (23837, "q34_r10_graph_scoring"),
    (24498, "q35_r10_quantreg_forecast"),
    (25181, "q36_r10_hdbscan_knn"),
    (25517, "q37_r10_trend_capture"),
    (25859, "q38_r10_wilcoxon_mi"),
    (26521, "q39_r10_cms_kappa"),
    (27040, "q40_r10_agreement_pr"),
    (27636, "q41_r10_bfs_pareto"),
    (28128, "q42_r10_effectsize_inequality"),
    (28650, "q43_r11_experimentation"),
    (29578, "q44_r11_timeseries_diag"),
    (30049, "q45_r11_sketch_composition"),
    (30476, "q46_r11_curation_analytics"),
    (30895, "q47_r11_econometrics"),
    (31575, "q48_r12_classical_tests"),
    (32168, "q49_r12_regression_diag"),
    (32850, "q50_r12_monitoring_survival"),
    (33426, "q51_r12_sketch_er"),
    (33940, "q52_r12_calibration_inequality"),
    (34541, "q53_r12_graph_jl_rank"),
    (35067, "q54_r12_stylometry_anova"),
    (36744, "q55_r12_readability_order"),
    (38406, "q56_r12_moments_tail"),
    (40071, "_window"),
]

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

starts = [c[0] for c in CHUNKS]
names = [c[1] for c in CHUNKS]
NCH = len(CHUNKS)


def chunk_of(lineno: int) -> int:
    lo = 0
    for k, b in enumerate(starts):
        if lineno >= b:
            lo = k
    return lo


# sanity: no top-level statement straddles a boundary
for s in tree.body:
    for b in starts[1:]:
        if s.lineno < b <= (s.end_lineno or s.lineno):
            raise SystemExit(f"statement at {s.lineno}-{s.end_lineno} straddles boundary {b}")


def defined_names(s):
    if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [s.name]
    if isinstance(s, ast.Assign):
        out = []
        for t in s.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, ast.Tuple):
                out += [e.id for e in t.elts if isinstance(e, ast.Name)]
        return out
    if isinstance(s, ast.AnnAssign) and isinstance(s.target, ast.Name):
        return [s.target.id]
    if isinstance(s, (ast.Import, ast.ImportFrom)):
        return [(a.asname or a.name).split(".")[0] for a in s.names]
    return []


defs: dict[str, list[int]] = collections.defaultdict(list)
for s in tree.body:
    ck = chunk_of(s.lineno)
    for nm in defined_names(s):
        defs[nm].append(ck)

uses: dict[int, set[str]] = collections.defaultdict(set)
for s in tree.body:
    ck = chunk_of(s.lineno)
    for node in ast.walk(s):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            uses[ck].add(node.id)

BUILTINS = set(dir(builtins))

os.makedirs(PKG, exist_ok=True)

init_imports = []
for k in range(NCH):
    start = starts[k]
    end = starts[k + 1] - 1 if k + 1 < NCH else len(lines)
    body = "".join(lines[start - 1 : end])
    mod = names[k]
    if k == 0:
        # registry prelude: fix one-level relative imports for the new depth
        body = body.replace("from .ops import", "from ..ops import")
        open(f"{PKG}/{mod}.py", "w").write(body)
        init_imports.append(mod)
        continue
    # imports this chunk needs: names defined ONLY in earlier chunks
    needed = collections.defaultdict(list)  # def_chunk -> [names]
    for nm in sorted(uses[k]):
        if nm in BUILTINS or nm not in defs:
            continue
        dchunks = defs[nm]
        if k in dchunks:
            continue  # defined locally (possibly re-defined; local wins)
        earlier = [c for c in dchunks if c < k]
        if earlier:
            needed[max(earlier)].append(nm)
    hdr = [
        f'"""Split from queries.py lines {start}-{end} (mechanical move, round 13).\n',
        "\n",
        "Registers this family's catalog entries on import; see queries/__init__.py\n",
        "for the ordered family list that reconstructs the original catalog order.\n",
        '"""\n\n',
        "from __future__ import annotations\n\n",
    ]
    for dc in sorted(needed):
        nms = needed[dc]
        line = f"from .{names[dc]} import {', '.join(nms)}\n"
        if len(line) > 100:
            line = f"from .{names[dc]} import (\n"
            for nm in nms:
                line += f"    {nm},\n"
            line += ")\n"
        hdr.append(line)
    hdr.append("\n")
    open(f"{PKG}/{mod}.py", "w").write("".join(hdr) + body)
    init_imports.append(mod)

# package __init__: docstring + ordered imports + flat-namespace hoist
doc = '"""' + src.split('"""')[1] + '"""'
init = [
    doc,
    "",
    "# Split into per-family submodules in round 13 (mechanical move of the",
    "# register-blocks; VERDICT r12 item 2).  Import order below IS the original",
    "# single-file order: register() appends to CATALOG in order, _window runs",
    "# last and applies the driver-window reorder + invariants.  The hoist loop",
    "# at the bottom reconstructs the original flat module namespace so every",
    "# external importer (`from ...queries import CATALOG / t / flagship / _AO_W`)",
    "# keeps working unchanged.",
    "",
    "import sys as _sys",
    "",
]
for mod in init_imports:
    init.append(f"from . import {mod} as {mod}")
init += [
    "from . import _window as _window",
    "",
    "_pkg = _sys.modules[__name__]",
    "for _m in (",
]
for mod in init_imports + ["_window"]:
    init.append(f"    {mod},")
init += [
    "):",
    "    for _k in vars(_m):",
    "        if not _k.startswith('__'):",
    "            setattr(_pkg, _k, getattr(_m, _k))",
    "",
]
open(f"{PKG}/__init__.py", "w").write("\n".join(init))

# _window needs CATALOG
wsrc = open(f"{PKG}/_window.py").read()
open(f"{PKG}/_window.py", "w").write(
    '"""Driver evidence window: rotation bookkeeping + catalog reorder.\n\n'
    "Split from queries.py (mechanical move, round 13); runs LAST on package\n"
    'import — see queries/__init__.py.\n"""\n\n'
    "from ._registry import CATALOG\n\n" + wsrc
)

os.remove(SRC)
print("wrote", NCH, "modules +", "__init__.py; removed", SRC)

"""Registry-wide lint for the hard-coded-id-schema class (VERDICT r12
"What's wrong" #2).

The class: an Arrow-batched kernel (``mapInPandas`` /
``applyInPandas(WithState)`` / ``transformWithStateInPandas``) or a
driver-built probe frame (``createDataFrame``) whose OUTPUT schema
hard-codes the type of an id column while the function accepts the id
column from caller data. A mismatched caller either dies mid-job in the
executor's pandas->Arrow cast (loud but late) or — worse, the r12 IVF
finding — is silently COERCED driver-side. The r12 fix added plan-time
``_require_integral_id`` guards, but the review that round proved the
class SPREADS: the dense-scorer fix was incomplete the day it was
written because the IVF paths carried the same pattern. This lint makes
the triage structural, the way tests/test_plans.py's UDF/cartesian/
broadcast lints closed their classes: every call site with a hard-coded
id-typed schema must either call ``_require_integral_id`` in the same
(outermost) function or sit on the explicit allowlist below, which
mirrors the SCALE.md "dense-kernel id guard" triage. The allowlist is
checked in BOTH directions — a stale entry (nothing flags it anymore)
fails too, so the list can't rot into a blanket waiver.

Detection (pure AST, no imports of the audited modules):

- audited calls: ``mapInPandas`` / ``applyInPandas`` / ``mapInArrow``
  / ``applyInArrow`` / ``applyInPandasWithState`` /
  ``transformWithStateInPandas`` / ``createDataFrame``, in every
  audit SCOPE: every def (module-level, class method, or nested
  inside a module-level compound statement — the gated-import
  pattern, each its own scope so its own guard counts), module-level
  statements under the pseudo-scope ``<module>`` (r13 ADVICE #2), and
  class-body non-method statements under ``Cls.<body>`` (r14 review
  finding #4);
- schema expressions are taken from the call's ``schema`` /
  ``outputStructType`` argument (keyword or positional). Local-variable
  resolution follows Name chains TRANSITIVELY with per-path cycle
  detection and a depth bound (``sch = "..."`` then ``schema = sch``
  — r13 ADVICE #1; diamonds re-resolve cleanly, r14 review finding
  #1), covering plain, annotated, and same-length tuple-unpacking
  assignments, and descends through ``IfExp`` branches and
  ``+``-concat operands (r14 review finding #2). Names resolve
  against the SITE'S LEXICAL CHAIN — the nearest enclosing scope,
  then enclosing function scopes outward (class bodies are invisible
  to code nested in them), then module-level assignments (r14 ADVICE
  #3: an id-free module DDL constant must not force a bogus guard;
  rebuilt as real per-site chains by the r15 review, whose earlier
  flat-scope form both leaked nested-def bindings into outer reads —
  a silent false pass — and let nested parameters block clean
  module-constant reads). Only STORE-context bindings shadow (reads
  of the name, e.g. as a subscript key, do not — r15 review finding
  #5). A Name whose winning binding is a form the order-insensitive
  resolver cannot model — ``+=``, walrus, a loop/with/except/match
  target, an import, a parameter — is POISONED: partial resolution
  must never read as complete, so the name flags as unresolved (r14
  ADVICE #1, generalized from AugAssign-only by the r15 review). A
  Name that dead-ends — poisoned, absent everywhere, assignment
  cycle (keyed per (scope, name) — r15 review finding #4), or depth
  cap — is NOT silently skipped: the site flags with an
  ``<unresolved schema: name>`` column so it gets reviewed (guarded
  or allowlisted) instead of invisibly passing. ``.format(...)``
  calls and ``%``-interpolation ANYWHERE in a resolved schema
  expression flag the same way (``<unresolved schema: str.format/%
  composition>``) — their substitutions are untraceable statically
  (r14 ADVICE #2; subtree scan, r15 review finding #3). Names nested
  in other constructor positions (``StructType(fields)`` call
  arguments, comprehensions) are not traced — documented reach limit;
- DDL strings (plain or f-string) are split into columns; a column is
  id-like under ONE token rule for both forms (r13 ADVICE #3): split
  the name — the literal column name, or the f-string placeholder's
  source — into identifier tokens and flag if any token is
  ``id``/``ids``/``key``/``keys``. ``doc_id string``, ``user_key
  string``, ``{id_col} long``, ``{key_col} string`` all flag;
  ``grid``, ``idx``, ``monkey`` don't. Every type in a DDL string is
  hard-coded by construction, so any id-like column flags the site;
- ``StructType`` constructions flag only ``StructField`` entries whose
  name is an id-like string literal AND whose type is a constructor
  call (``LongType()``): a type read off an input field
  (``base.schema[id_col].dataType``) or a variable propagates the
  caller's type and is the documented-graceful pattern.

Known reach limits (documented, not silent):

- a schema assembled by joining per-column f-strings over an opaque
  loop variable (``", ".join(f"{c} string" for c in cols)`` —
  ``first_seen_dedup_stateful``) carries no statically id-like name;
  that function casts every column to string BEFORE the kernel, so it
  is in the graceful class anyway;
- guard detection is scope-level, not per-site (see
  ``audit_source``): a function that guards one input but hard-codes
  an id schema over a second, unguarded input reads guarded;
- Names nested inside constructor calls or comprehensions
  (``StructType(fields)`` where ``fields`` is a variable) are not
  traced through the call boundary — the resolver covers alias
  chains, ``IfExp`` branches, and ``+``-concat operands only;
- non-plain binding forms are detected but not MODELED: ``sch +=
  ...``, walrus, loop/with/except/match targets, imports, and
  parameters poison the name to a visible ``<unresolved>`` finding
  rather than computing the bound value (order-sensitive or dynamic
  dataflow is out of reach for this order-insensitive resolver) —
  this includes the common ``schema=None`` parameter defaulted inside
  the body, which must be reviewed rather than trusted;
- ``.format()`` / ``%`` composition likewise flags visibly rather
  than tracing the substituted values, wherever it sits in the
  schema expression's subtree;
- scoping is static LEGB (per-site lexical environment chains through
  nested defs, class scopes invisible to nested functions, module
  fallback) — but STATEMENT ORDER within a scope is not modeled: all
  of a scope's plain assignments contribute as alternatives
  regardless of position, and a name declared ``global`` anywhere in
  the module poisons the module constant for every reader (its
  runtime value is order-dependent).

Either way a smuggled mismatch still fails its own pandas->Arrow cast
loudly at task time under the session-wide safe-conversion pin — this
lint moves the common forms to plan/CI time; the pin remains the
backstop for what static analysis can't see.

Run: ``python tools/id_schema_lint.py`` — prints one line per finding
and exits non-zero on any unguarded, un-allowlisted site or any stale
allowlist entry.
"""

from __future__ import annotations

import ast
import dataclasses
import os
import re
import sys

PKG = "realtime_voting_data_engineering_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Call attributes whose schema argument types executor output rows.
# mapInArrow/applyInArrow are the sibling Arrow-native APIs — the
# natural performance port for a dense kernel carries the same
# hard-coded-schema hazard (r13 review finding #3).
_SCHEMA_CALLS = {
    "mapInPandas": ("schema", 1),
    "applyInPandas": ("schema", 1),
    "mapInArrow": ("schema", 1),
    "applyInArrow": ("schema", 1),
    "applyInPandasWithState": ("outputStructType", 1),
    "transformWithStateInPandas": ("outputStructType", 1),
    "createDataFrame": ("schema", 1),
}

GUARD_NAME = "_require_integral_id"

# (module relpath under the package, outermost function) -> rationale.
# Mirrors SCALE.md "Round-12 — dense-kernel id guard" plus the r13 lint
# extension to the generator/stateful surfaces; every entry must stay
# matched by a live finding (stale entries fail the lint).
ALLOWLIST: dict[tuple[str, str], str] = {
    ("operators/text.py", "winnow_fingerprints_kernel"): (
        "kernel emits {id_col} string then casts back to the INPUT id "
        "type before returning — graceful for any caller id type"
    ),
    ("operators/multimodal.py", "decode_features"): (
        "media_id long is the documented fixed media contract; the "
        "function takes no id_col — not a generic-id surface"
    ),
    ("datagen.py", "generate_vote_events"): (
        "candidate_id string is the generator's own voting schema; the "
        "ordinal frame joins back to ids this module itself created"
    ),
    ("streaming/stateful.py", "running_totals_stateful"): (
        "voting-schema string key contract; emits the group key it was "
        "given — streaming op, equivalence pytest-covered"
    ),
    ("streaming/stateful.py", "running_totals_tws"): (
        "transformWithState twin of running_totals_stateful; same "
        "string key contract (environment-gated, PARITY.md)"
    ),
}


@dataclasses.dataclass(frozen=True)
class IdSchemaSite:
    """One call site whose schema hard-codes an id-typed column."""

    module: str  # relpath under the package, e.g. "operators/similarity.py"
    function: str  # outermost enclosing def
    lineno: int  # of the schema-taking call
    call: str  # mapInPandas / createDataFrame / ...
    columns: tuple[str, ...]  # offending "name type" renderings
    guarded: bool  # _require_integral_id called in the same function


# Subtrees a scope walk never descends into. Real functions own their
# nested defs' call sites (the kernel-closure pattern) but not their
# guard calls, so the guard walk skips _FN_SKIP; pseudo-scopes
# (<module>, Cls.<body>) own neither — every def/class found inside
# them is extracted as its own scope — so both their site walk and
# their guard walk skip _PSEUDO_SKIP.
_FN_SKIP = (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
_PSEUDO_SKIP = _FN_SKIP + (ast.ClassDef,)


def _walk_skipping(root: ast.AST, skip: tuple):
    stack = list(ast.iter_child_nodes(root))
    while stack:
        node = stack.pop()
        yield node
        if not isinstance(node, skip):
            stack.extend(ast.iter_child_nodes(node))


def _iter_scopes(tree: ast.Module):
    """Yield (qualname, node, is_pseudo) for every audit scope:

    - every def — module-level, a class method, or nested inside a
      module-level/class-body compound statement (``if``/``try``/
      ``with`` — the gated-import pattern; r14 review finding #5: such
      a def must be its OWN scope so its in-function guard counts,
      rather than landing in ``<module>`` where a stray module-level
      guard would blanket-waive it). Defs nested inside another def
      still belong to that def (the kernel-closure rule);
    - ``<module>`` — module-level statements outside any def/class
      (r13 ADVICE #2), with extracted def/class subtrees excluded
      from its walk;
    - ``Cls.<body>`` — class-body statements that are not methods
      (r14 review finding #4: a schema call in a class attribute
      initializer was invisible to both the method pass and the
      module pseudo-scope)."""
    scopes: list = []

    def scan(stmts, prefix: str, pseudo_name: str) -> None:
        residue = []
        for node in stmts:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                scopes.append((prefix + node.name, node, False))
            elif isinstance(node, ast.ClassDef):
                scan(
                    node.body,
                    f"{prefix}{node.name}.",
                    f"{prefix}{node.name}.<body>",
                )
            else:
                residue.append(node)
                # Extract defs/classes nested in compound statements
                # (if/try/for/while/with) as their own scopes.
                stack = list(ast.iter_child_nodes(node))
                while stack:
                    sub = stack.pop()
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        scopes.append((prefix + sub.name, sub, False))
                    elif isinstance(sub, ast.ClassDef):
                        scan(
                            sub.body,
                            f"{prefix}{sub.name}.",
                            f"{prefix}{sub.name}.<body>",
                        )
                    elif not isinstance(sub, ast.Lambda):
                        stack.extend(ast.iter_child_nodes(sub))
        if residue:
            scopes.append(
                (pseudo_name, ast.Module(body=residue, type_ignores=[]), True)
            )

    scan(tree.body, "", "<module>")
    return scopes


def _scope_bindings(nodes) -> "dict[str, list[ast.expr | None]]":
    """Name -> assigned value exprs (or ``None`` poison) over EVERY
    binding form in an iterable of scope nodes.

    Modeled bindings carry their value expression: plain, ANNOTATED,
    and same-length no-star tuple-unpacking assignments (r13 review
    finding #1: ``out_schema: str = "query_id long, ..."`` was
    invisible to the plain-Assign-only version — a silent bypass of
    exactly the class this lint closes).

    Every OTHER binding of a name appends ``None`` — a poison marker.
    The r14 ADVICE #1 fix poisoned AugAssign only; the r15 review
    proved the same partial-resolution-reads-as-complete hole for
    every other unmodeled rebinding form alongside a plain assignment
    (walrus, ``for``/``with``/``except``/comprehension targets,
    imports, ``match`` capture patterns, mismatched/starred tuple
    unpacking, parameters, nested def/class/lambda names, global/
    nonlocal declarations). The rule is now structural: a form this
    order-insensitive resolver cannot model poisons the name, and the
    resolver turns any poisoned name into a visible ``<unresolved>``
    finding instead of resolving only the plain assignments.

    Poisoning recurses target subtrees collecting only STORE-context
    Names (r15 review finding #5: collecting every Name in the target
    subtree counted ``cache[OUT_SCHEMA] = 1`` — a read of the name as
    a subscript key — as a local binding, blocking the module-constant
    fallback on a clean site).

    Callers decide WHICH nodes constitute the scope: ``_scope_env``
    feeds one scope's OWN statements (everything outside nested
    def/class/lambda bodies — their heads contribute only the bound
    NAME) plus that scope's own parameters, so a binding never leaks
    across a scope boundary in either direction (r15 review second and
    third passes: a nested kernel's id-free local silently resolved an
    outer read that at runtime hit the id-typed MODULE constant, and a
    function-nested class body did the same; nested-def params blocked
    clean module-constant reads). Cross-scope resolution is the
    resolver's job, via explicit lexical environment chains."""
    out: dict[str, list["ast.expr | None"]] = {}

    def poison_name(name: str) -> None:
        out.setdefault(name, []).append(None)

    def poison(node: ast.AST) -> None:
        for n in ast.walk(node):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Store):
                poison_name(n.id)

    def model(tgt: ast.expr, value: ast.expr) -> None:
        if isinstance(tgt, ast.Name):
            out.setdefault(tgt.id, []).append(value)
        elif (
            isinstance(tgt, (ast.Tuple, ast.List))
            and isinstance(value, (ast.Tuple, ast.List))
            and len(tgt.elts) == len(value.elts)
            and not any(isinstance(e, ast.Starred) for e in tgt.elts)
            and not any(isinstance(e, ast.Starred) for e in value.elts)
        ):
            for t, v in zip(tgt.elts, value.elts):
                model(t, v)
        else:
            poison(tgt)

    for node in nodes:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                model(tgt, node.value)
        elif isinstance(node, ast.AnnAssign):
            if node.value is not None:
                model(node.target, node.value)
            # a bare annotation (``x: str``) binds nothing at runtime
        elif isinstance(node, (ast.AugAssign, ast.NamedExpr)):
            poison(node.target)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            poison(node.target)
        elif isinstance(node, ast.comprehension):
            poison(node.target)
        elif isinstance(node, ast.withitem):
            if node.optional_vars is not None:
                poison(node.optional_vars)
        elif isinstance(node, ast.ExceptHandler):
            if node.name:
                poison_name(node.name)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            # the def STATEMENT binds its name in the enclosing scope;
            # its parameters belong to the def's OWN scope and are
            # added by _scope_env for that scope only (r15 review
            # third pass: poisoning nested-def params into the
            # enclosing env blocked clean module-constant reads)
            poison_name(node.name)
        elif isinstance(node, ast.ClassDef):
            poison_name(node.name)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                poison_name((alias.asname or alias.name).split(".")[0])
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            # declares the names rebindable here — treat as shadowing
            for name in node.names:
                poison_name(name)
        elif isinstance(node, (ast.MatchAs, ast.MatchStar)):
            if node.name:
                poison_name(node.name)
        elif isinstance(node, ast.MatchMapping):
            if node.rest:
                poison_name(node.rest)
    return out


_SCOPE_NODES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda, ast.ClassDef)


def _scope_env(scope: ast.AST) -> "dict[str, list[ast.expr | None]]":
    """One scope node's own binding environment: its direct statements
    (nested def/class/lambda bodies excluded — their heads contribute
    only the name they bind) plus, for defs/lambdas, the scope's own
    parameters as poison (caller-controlled values the resolver cannot
    model)."""
    env = _scope_bindings(_walk_skipping(scope, _PSEUDO_SKIP))
    if isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
        a = scope.args
        for arg in a.posonlyargs + a.args + a.kwonlyargs:
            env.setdefault(arg.arg, []).append(None)
        if a.vararg:
            env.setdefault(a.vararg.arg, []).append(None)
        if a.kwarg:
            env.setdefault(a.kwarg.arg, []).append(None)
    return env


def _site_owners(fn: ast.AST) -> "tuple[dict[int, ast.AST], dict[int, ast.AST | None]]":
    """``(owners, parents)``: ``owners`` maps id(node) -> nearest
    enclosing scope node (def/class/lambda; ``fn`` itself for its
    direct body) for every node under ``fn``; ``parents`` maps
    id(scope node) -> its enclosing scope node (None for ``fn``). The
    kernel-closure rule keeps SITE OWNERSHIP (findings, guards,
    allowlisting) at the outermost function; these maps only decide
    which lexical environment chain resolves each site's names (r15
    review third pass: a site inside a nested def must resolve the
    nested def's own locals, not the outer scope's)."""
    owners: "dict[int, ast.AST]" = {id(fn): fn}
    parents: "dict[int, ast.AST | None]" = {id(fn): None}

    def walk(node: ast.AST, owner: ast.AST) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, _SCOPE_NODES):
                parents[id(child)] = owner
                owners[id(child)] = child
                # Only the BODY executes in the new scope. Header
                # expressions — decorators, parameter defaults,
                # annotations, class bases/keywords — evaluate in the
                # ENCLOSING scope at definition time (r15 review
                # fourth pass #2: a schema call in a nested def's
                # default arg resolved the def's own clean local
                # while the runtime default reads the enclosing
                # scope's id-typed binding — silent false pass, plus
                # the mirror false flag).
                body = (
                    [child.body]
                    if isinstance(child, ast.Lambda)
                    else child.body
                )
                body_ids = {id(b) for b in body}
                for part in ast.iter_child_nodes(child):
                    if id(part) in body_ids:
                        owners[id(part)] = child
                        walk(part, child)
                    else:
                        owners[id(part)] = owner
                        walk(part, owner)
            else:
                owners[id(child)] = owner
                walk(child, owner)

    walk(fn, fn)
    return owners, parents


def _env_chain(
    scope: ast.AST,
    parents: "dict[int, ast.AST | None]",
    env_cache: "dict[int, dict]",
) -> "list[dict]":
    """Lexical environment chain for reads FROM ``scope``, innermost
    first: the scope's own env, then every enclosing FUNCTION scope's
    env. Enclosing CLASS bodies are skipped — Python class scopes are
    invisible to code nested inside them (only the class's own body
    reads them, which the ``scope is own`` head covers)."""
    chain = [env_cache[id(scope)]]
    cur = parents.get(id(scope))
    while cur is not None:
        if not isinstance(cur, ast.ClassDef):
            chain.append(env_cache[id(cur)])
        cur = parents.get(id(cur))
    return chain


def _schema_arg(call: ast.Call) -> "ast.expr | None":
    kw_name, pos = _SCHEMA_CALLS[call.func.attr]  # type: ignore[union-attr]
    for kw in call.keywords:
        if kw.arg == kw_name:
            return kw.value
    if len(call.args) > pos:
        return call.args[pos]
    return None


def _ddl_fragments(expr: ast.expr) -> list[str]:
    """Render every string/f-string fragment reachable in the
    expression (f-string placeholders become ``{source}``)."""
    frags: list[str] = []
    for node in ast.walk(expr):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            frags.append(node.value)
        elif isinstance(node, ast.JoinedStr):
            parts = []
            for part in node.values:
                if isinstance(part, ast.Constant):
                    parts.append(str(part.value))
                elif isinstance(part, ast.FormattedValue):
                    parts.append("{" + ast.unparse(part.value) + "}")
            frags.append("".join(parts))
    # ast.walk double-yields f-string inner constants (JoinedStr
    # children are Constants too); that's harmless here — non-DDL
    # fragments are filtered by the column-shape check in
    # _offending_ddl_columns and duplicate columns are deduped in
    # audit_source.
    return frags


def _split_ddl_columns(ddl: str) -> list[tuple[str, str]]:
    """Top-level comma split of a DDL-ish string into (name, type),
    respecting ``array<...>`` / ``struct<...>`` nesting."""
    cols, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    out = []
    for col in cols:
        bits = col.strip().split(None, 1)
        if len(bits) == 2:
            out.append((bits[0], bits[1]))
    return out


def _name_is_id_like(name: str) -> bool:
    # ONE token rule for both forms (r13 ADVICE #3: literal 'user_key
    # string' previously passed while '{key_col} string' flagged).
    # Token match, not substring (r13 review finding #5: substring 'id'
    # flagged {grid_col}/{idx_col} — a false failure forcing a
    # meaningless guard or a bogus allowlist entry). Split the name —
    # f-string placeholder source or literal column name — into
    # identifier tokens: id_col, user_key, doc_id, {key_col} flag;
    # grid_col, idx, width, monkey don't.
    source = name[1:-1] if name.startswith("{") and name.endswith("}") else name
    tokens = re.split(r"[^a-z]+", source.strip("`").lower())
    return any(t in ("id", "ids", "key", "keys") for t in tokens)


_TYPE_TOKEN = re.compile(
    r"^(tinyint|smallint|int(eger)?|bigint|long|string|varchar.*|char.*|"
    r"float|double|decimal.*|binary|boolean|date|timestamp.*)\b",
    re.IGNORECASE,
)


def _offending_ddl_columns(expr: ast.expr) -> list[str]:
    offending = []
    for frag in _ddl_fragments(expr):
        if "," not in frag and " " not in frag.strip():
            continue  # not a DDL column list (separator / bare token)
        for name, typ in _split_ddl_columns(frag):
            # A placeholder TYPE ({id_type}-style) propagates the
            # caller's type — only literal type tokens are hard-coded.
            if _name_is_id_like(name) and _TYPE_TOKEN.match(typ.strip()):
                offending.append(f"{name} {typ.strip()}")
    return offending


def _offending_structfields(expr: ast.expr) -> list[str]:
    """StructField("query_id", LongType()) — literal id-like name AND a
    type-constructor CALL (a .dataType attribute or a variable
    propagates the input type and is the graceful pattern)."""
    offending = []
    for node in ast.walk(expr):
        if not (isinstance(node, ast.Call) and _callee_name(node) == "StructField"):
            continue
        # Positional or keyword style (r13 review finding #2:
        # StructField(name="query_id", dataType=LongType()) bypassed
        # the positional-only version).
        kwargs = {kw.arg: kw.value for kw in node.keywords}
        name_arg = node.args[0] if node.args else kwargs.get("name")
        type_arg = (
            node.args[1] if len(node.args) > 1 else kwargs.get("dataType")
        )
        if name_arg is None or type_arg is None:
            continue
        if (
            isinstance(name_arg, ast.Constant)
            and isinstance(name_arg.value, str)
            and _name_is_id_like(name_arg.value)
            and isinstance(type_arg, ast.Call)
        ):
            offending.append(f"{name_arg.value} {ast.unparse(type_arg)}")
    return offending


def _resolve_schema_exprs(
    schema: ast.expr,
    envs: "list[dict[str, list[ast.expr | None]]]",
    module_assigns: "dict[str, list[ast.expr | None]] | None" = None,
    max_depth: int = 8,
) -> "tuple[list[ast.expr], list[str]]":
    """Resolve a schema expression to its non-Name value expressions,
    against a LEXICAL environment chain ``envs`` (innermost scope
    first) with ``module_assigns`` as the outermost fallback.

    Name chains (``sch = "..."``; ``schema = sch``) are followed
    transitively up to ``max_depth`` (r13 ADVICE #1: the one-level
    version resolved an aliased Name to an empty list and the site
    silently passed). Cycle detection is PER-PATH (the recursion
    stack), not global — a diamond (two branches assigning
    ``schema = sch``) re-resolves ``sch`` cleanly instead of falsely
    reporting it unresolved (r14 review finding #1); only a true
    cycle (``a = b; b = a``) or the depth cap dead-ends, keyed on
    (binding scope, name), never the bare name (r15 review finding
    #4: a module chain through a name colliding with a local falsely
    read as a cycle). Resolution also descends through the
    string-composition positions a schema value can hide in —
    ``IfExp`` branches and ``+``-concat operands (r14 review finding
    #2).

    Scoping is Python's LEGB minus builtins (r14 ADVICE #3, rebuilt
    as real lexical chains by the r15 review's third pass): a Name
    resolves in the innermost chain env that binds it, else in
    ``module_assigns``; a value found at chain depth *i* resolves its
    own Names from depth *i* outward (the assignment executes in that
    scope), never back inward. Each env records EVERY binding form in
    its scope — a parameter, loop variable, import, match capture —
    as a value or a ``None`` poison (``_scope_bindings``/
    ``_scope_env``), so an id-free module DDL constant resolves and
    passes, while a name whose winning binding is unmodeled (``+=``,
    walrus, a loop/with/except/match target, an import, a parameter;
    r14 ADVICE #1, generalized) is ALWAYS unresolved: resolving only
    the plain assignments would read partial resolution as complete.

    ``.format(...)`` calls and ``%``-interpolation ANYWHERE in a
    resolved schema expression land in ``unresolved`` as
    ``str.format/% composition`` (r14 ADVICE #2; subtree scan, not
    outermost-only — r15 review finding #3) — their substituted
    values are statically untraceable, and the literal fragments
    alone (``"{} long"``) carry no id-like token for the DDL pass to
    catch.

    Returns ``(resolved exprs, unresolved descriptions)``: a Name
    that dead-ends (poisoned binding, absent everywhere, cycle, depth
    cap) or a composition lands in ``unresolved`` so the caller flags
    the site visibly instead of skipping it. Names nested in OTHER
    constructor positions (call arguments like ``StructType(fields)``,
    comprehensions) are NOT traced — the documented reach limit,
    backstopped by the task-time safe-Arrow pin."""

    def lookup(name: str, start) -> "tuple[list | None, object]":
        if start != "module":
            for i in range(start, len(envs)):
                values = envs[i].get(name)
                if values is not None:
                    return values, i
        return (module_assigns or {}).get(name), "module"

    def expand(expr: ast.expr, stack: frozenset, env) -> "tuple[list, list]":
        if isinstance(expr, ast.Name):
            if len(stack) >= max_depth:
                return [], [expr.id]
            values, venv = lookup(expr.id, env)
            key = (venv, expr.id)
            if key in stack or not values or any(v is None for v in values):
                return [], [expr.id]
            resolved, unresolved = [], []
            for v in values:
                r, u = expand(v, stack | {key}, venv)
                resolved += r
                unresolved += u
            return resolved, unresolved
        if isinstance(expr, ast.IfExp):
            r1, u1 = expand(expr.body, stack, env)
            r2, u2 = expand(expr.orelse, stack, env)
            return r1 + r2, u1 + u2
        if isinstance(expr, ast.BinOp) and isinstance(expr.op, ast.Add):
            r1, u1 = expand(expr.left, stack, env)
            r2, u2 = expand(expr.right, stack, env)
            return r1 + r2, u1 + u2
        unresolved = (
            ["str.format/% composition"] if _has_composition(expr) else []
        )
        return [expr], unresolved

    resolved, unresolved = expand(schema, frozenset(), 0)
    return resolved, sorted(set(unresolved))


def _has_composition(expr: ast.expr) -> bool:
    """True if the expression's subtree contains ``.format(...)`` or a
    ``%`` interpolation — statically untraceable string composition
    that must flag visibly wherever it sits in the schema expression,
    not only at the outermost position (r15 review finding #3)."""
    for n in ast.walk(expr):
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mod):
            return True
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "format"
        ):
            return True
    return False


def _callee_name(call: ast.Call) -> str:
    if isinstance(call.func, ast.Name):
        return call.func.id
    if isinstance(call.func, ast.Attribute):
        return call.func.attr
    return ""


def audit_source(source: str, module: str) -> list[IdSchemaSite]:
    """Pure audit of one module's source; ``module`` is the relpath
    used in findings and the allowlist.

    Per-scope walks: a real function's SITE walk is ``ast.walk`` (a
    schema call inside a nested def — the kernel-closure pattern —
    belongs to its outermost function) while its GUARD walk skips
    nested defs/lambdas (r13 review finding #4: a guard inside a
    possibly-never-invoked closure must not mark the outer function
    guarded). A pseudo-scope (``<module>``, ``Cls.<body>``) owns
    NEITHER — every def/class inside it was extracted as its own scope
    by ``_iter_scopes`` — so both walks skip def/class subtrees. Guard
    detection stays scope-level, not per-site: statically matching
    which DataFrame a guard call covers is out of reach, so a function
    that guards one input but hard-codes an id schema over a second,
    unguarded input still reads guarded — documented limit, same tier
    as the join-comprehension reach note."""
    tree = ast.parse(source)
    sites: list[IdSchemaSite] = []
    # Module-level assignments (outside every def/class body) — the
    # fallback environment for Names a scope reads but never binds
    # (r14 ADVICE #3). The AugAssign poison applies here too: a module
    # constant built up via ``+=`` is unresolvable for everyone.
    module_assigns = _scope_bindings(_walk_skipping(tree, _PSEUDO_SKIP))
    # A name declared ``global`` in ANY function may be rebound at
    # runtime to a value no static constant reflects — the fallback
    # must treat the module "constant" as unresolvable (r15 review
    # second pass: ``global OUT_SCHEMA`` in a setup function let an
    # id-typed runtime schema resolve to the id-free module literal
    # and pass silently).
    for node in ast.walk(tree):
        if isinstance(node, ast.Global):
            for name in node.names:
                module_assigns.setdefault(name, []).append(None)
    for fn_name, fn, pseudo in _iter_scopes(tree):
        if pseudo:
            # Pseudo-scopes own no nested def/class (extracted by
            # _iter_scopes), so a fixed chain suffices. <module>
            # resolves against the module assignments themselves —
            # which carry the Global poison, so a MODULE-LEVEL site
            # reading a global-rebound constant dead-ends too (r15
            # review third pass #1: the pseudo-scope's residue env
            # previously held the stale un-poisoned literal). A class
            # body resolves its own bindings first, then module.
            site_nodes = list(_walk_skipping(fn, _PSEUDO_SKIP))
            chain = (
                [] if fn_name == "<module>" else [_scope_bindings(site_nodes)]
            )

            def site_envs(node, _chain=chain):
                return _chain

        else:
            # Site walk covers nested defs (the kernel-closure rule:
            # ownership — findings, guards, allowlist keys — stays at
            # the outermost function), but NAME RESOLUTION is lexical
            # (r15 review third pass): each site resolves against its
            # nearest enclosing scope's env, then enclosing FUNCTION
            # scopes outward (class bodies are invisible to code
            # nested in them), then module. Bindings never leak
            # across a scope boundary in either direction.
            site_nodes = list(ast.walk(fn))
            if not any(
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr in _SCHEMA_CALLS
                for n in site_nodes
            ):
                # no schema-taking call anywhere — skip the owner/env
                # construction (most functions; r15 review fourth
                # pass #3)
                continue
            owners, parents = _site_owners(fn)
            scopes = [n for n in site_nodes if isinstance(n, _SCOPE_NODES)]
            env_cache = {id(s): _scope_env(s) for s in scopes}
            # ``nonlocal`` is ``global``'s function-scope sibling (r15
            # review fourth pass #1): a nested def rebinding an
            # enclosing function's name makes that binding's runtime
            # value order-dependent, so the name is poisoned in every
            # scope env the declaration sits under (over-poisoning
            # the intermediate scopes is the visible, review-forcing
            # direction).
            for scope in scopes:
                env = env_cache[id(scope)]
                for n in ast.walk(scope):
                    if isinstance(n, ast.Nonlocal):
                        for name in n.names:
                            env.setdefault(name, []).append(None)

            def site_envs(node, _o=owners, _p=parents, _c=env_cache):
                return _env_chain(_o[id(node)], _p, _c)

        guarded = any(
            isinstance(n, ast.Call) and _callee_name(n) == GUARD_NAME
            for n in _walk_skipping(fn, _PSEUDO_SKIP if pseudo else _FN_SKIP)
        )
        for node in site_nodes:
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in _SCHEMA_CALLS
            ):
                continue
            schema = _schema_arg(node)
            if schema is None:
                continue
            exprs, unresolved = _resolve_schema_exprs(
                schema, site_envs(node), module_assigns
            )
            # An unresolvable schema Name flags the site rather than
            # silently passing it (r13 ADVICE #1): the reviewer either
            # guards the function or allowlists it with a rationale.
            offending: list[str] = [
                f"<unresolved schema: {n}>" for n in unresolved
            ]
            for expr in exprs:
                offending += _offending_ddl_columns(expr)
                offending += _offending_structfields(expr)
            if offending:
                sites.append(
                    IdSchemaSite(
                        module=module,
                        function=fn_name,
                        lineno=node.lineno,
                        call=node.func.attr,
                        columns=tuple(dict.fromkeys(offending)),
                        guarded=guarded,
                    )
                )
    return sites


def audit_package(pkg_root: "str | None" = None) -> list[IdSchemaSite]:
    root = pkg_root or os.path.join(REPO, PKG)
    sites: list[IdSchemaSite] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            with open(path, encoding="utf-8") as f:
                sites.extend(audit_source(f.read(), rel))
    return sites


def violations(
    sites: list[IdSchemaSite],
    allowlist: "dict[tuple[str, str], str] | None" = None,
) -> "tuple[list[IdSchemaSite], list[tuple[str, str]]]":
    """(unguarded un-allowlisted sites, stale allowlist entries)."""
    allow = ALLOWLIST if allowlist is None else allowlist
    unguarded = [s for s in sites if not s.guarded]
    bad = [s for s in unguarded if (s.module, s.function) not in allow]
    live = {(s.module, s.function) for s in unguarded}
    stale = sorted(k for k in allow if k not in live)
    return bad, stale


def main() -> int:
    sites = audit_package()
    bad, stale = violations(sites)
    for s in sites:
        status = (
            "guarded"
            if s.guarded
            else (
                "allowlisted"
                if (s.module, s.function) in ALLOWLIST
                else "UNGUARDED"
            )
        )
        print(
            f"{status:11s} {s.module}:{s.lineno} {s.function} "
            f"[{s.call}] {', '.join(s.columns)}"
        )
    for key in stale:
        print(f"STALE allowlist entry (nothing flags it): {key}")
    if bad or stale:
        print(
            f"id_schema_lint: FAIL ({len(bad)} unguarded site(s), "
            f"{len(stale)} stale allowlist entr(ies))",
            file=sys.stderr,
        )
        return 1
    print(
        f"id_schema_lint: PASS ({len(sites)} id-typed schema site(s): "
        f"{sum(s.guarded for s in sites)} guarded, "
        f"{len(sites) - sum(s.guarded for s in sites)} allowlisted)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Host-locale audit: operator-vs-oracle agreement and result
invariance when the JVM's DEFAULT LOCALE is adversarial — the eleventh
adversary class, closing the execution-environment axis set (timezone,
concurrency, task retries, memory pressure, and now locale).

The classic hazard is the Turkish dotless i: under ``tr_TR``,
``"TITLE".toLowerCase()`` produces ``tıtle`` and ``"i".toUpperCase()``
produces ``İ`` in any JVM code that uses the default locale, and
locale-sensitive collators order ``ı`` BEFORE ``i`` while binary
ordering puts it after ``z``. Spark deliberately routes its SQL string
functions through ``Locale.ROOT`` / binary collation (a decade of
Turkish-locale bug fixes, e.g. SPARK-20156), and this repo's operators
add their own case folds (ASCII fold in the text fingerprints) — but
nothing certifies the claim END TO END for THIS engine's 98 queries.
This audit does: every string-touching pipeline (tokenization, case
folding, md5 fingerprints over folded text, BM25 term matching,
shingling, ORDER BY on strings) must produce oracle-exact results on a
JVM whose default locale would corrupt each of those steps if any code
path consulted it.

Two subprocess legs (a JVM's default locale is launch-fixed, via
``--driver-java-options -Duser.language=…``):

- **Leg A (engine vs oracle, Turkish JVM):** the full oracled registry
  under ``tr_TR`` — the most dangerous locale for case mapping.
- **Leg B (cross-locale invariance):** the string-heavy queries re-run
  under ``lt_LT`` (Lithuanian — its own special-case i-dot rules) and
  their canonical Spark hashes must be byte-identical to leg A's.

Sanity gates: the worker asserts the JVM default locale really is the
adversarial one, and proves the adversary has TEETH on this JVM — the
default-locale ``java.text.Collator`` must order ``ı`` differently
from the ``Locale.ROOT`` collator (measured: default says ``ı < i``,
ROOT says ``ı > j``) while a Spark ``ORDER BY`` stays binary. A
worker whose probe shows no difference is running a crippled locale
and would certify nothing.

Run: ``python tools/locale_audit.py [--sf-dir ...]``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: String-processing queries — the cross-locale invariance set for
#: leg B: case folds, tokenization, text fingerprints/md5 over folded
#: text, term matching, shingling, and string ORDER BY / GROUP BY keys.
STRING_QUERIES = [
    "text_profile",
    "top_words",
    "doc_fingerprint_clusters",
    "bm25_search_topk",
    "minhash_lsh_dedup",
    "ngram_near_dup_pairs",
    "simhash_near_dup",
    "winnow_overlap_topk",
    "document_chunks",
    "corpus_curation_pipeline",
    "incremental_new_docs",
    "voters_by_segment",
    "scalar_function_profile",
    "vote_share",
]


def worker(sf_dir: str, only: list[str] | None, report_path: str) -> None:
    want = os.environ.get("RTV_LOCALE_WANT")
    assert want, "worker must be launched with RTV_LOCALE_WANT set"

    from realtime_voting_data_engineering_spark import queries as Q
    from realtime_voting_data_engineering_spark.session import get_spark
    from tests.oracle_harness import compare_query, spark_result_hash

    spark = get_spark(app_name="locale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    jvm_locale = jvm.java.util.Locale.getDefault().toString()
    assert jvm_locale == want, (
        f"JVM default locale is {jvm_locale!r}, wanted {want!r} — the "
        "audit would silently degrade to an en_US re-run"
    )
    # Teeth probe: default-locale-sensitive JVM APIs must actually
    # behave differently from Locale.ROOT here, else the locale is
    # crippled and certifies nothing. The Turkish/Lithuanian collators
    # both move dotless ı relative to binary order.
    dflt = jvm.java.text.Collator.getInstance()
    root = jvm.java.text.Collator.getInstance(jvm.java.util.Locale.ROOT)
    probe = (dflt.compare("ı", "j"), root.compare("ı", "j"))
    assert probe[0] != probe[1], (
        f"default and ROOT collators agree on ı-vs-j ({probe}) under "
        f"{jvm_locale} — the adversary has no teeth on this JVM"
    )
    # ...while the ENGINE must stay binary-ordered regardless.
    ordered = [
        r[0]
        for r in spark.sql(
            "SELECT x FROM VALUES ('i'),('ı'),('j') AS t(x) ORDER BY x"
        ).collect()
    ]
    assert ordered == ["i", "j", "ı"], (
        f"Spark ORDER BY followed the host locale: {ordered}"
    )

    report: dict[str, dict] = {
        "_env": {"jvm_locale": jvm_locale, "collator_probe": list(probe)}
    }
    for name, spec in sorted(Q.REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        entry: dict = {}
        try:
            compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
            entry["status"] = "match"
        except AssertionError as exc:
            entry["status"] = "mismatch"
            entry["detail"] = str(exc)[:500]
        except Exception as exc:  # noqa: BLE001 — audit must survive any query
            entry["status"] = "error"
            entry["detail"] = f"{type(exc).__name__}: {str(exc)[:300]}"
        if name in STRING_QUERIES:
            try:
                entry["spark_hash"] = spark_result_hash(spec.fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                entry["spark_hash"] = f"error:{type(exc).__name__}"
        report[name] = entry
        print(
            json.dumps({"query": name, "status": entry["status"]}), flush=True
        )
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)


def _run_worker(
    lang: str, country: str, sf_dir: str, only: list[str] | None, report: str
) -> dict:
    env = dict(
        os.environ,
        RTV_LOCALE_WANT=f"{lang}_{country}",
        # Belt: the env locale too (this container lacks the glibc
        # locale so the JVM ignores LANG — user.language is the lever
        # that actually works, asserted by the worker's sanity gate).
        LANG=f"{lang}_{country}.UTF-8",
        LC_ALL=f"{lang}_{country}.UTF-8",
        PYSPARK_SUBMIT_ARGS=(
            f'--driver-java-options "-Duser.language={lang} '
            f'-Duser.country={country}" pyspark-shell'
        ),
    )
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--sf-dir", sf_dir, "--report", report]
    if only:
        cmd += ["--only", ",".join(only)]
    print(f"## worker locale={lang}_{country} "
          f"only={len(only) if only else 'ALL'}", flush=True)
    subprocess.run(cmd, env=env, check=True)
    with open(report) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--report", default="/tmp/rtv_locale_audit.json")
    args = ap.parse_args()

    if args.worker:
        only = args.only.split(",") if args.only else None
        worker(args.sf_dir, only, args.report)
        return 0

    # --only narrows BOTH legs (tools/run_audits.py --quick relies on
    # this; pre-r9 the orchestrator silently ignored it and ran full).
    only = args.only.split(",") if args.only else None
    string_queries = [
        n for n in STRING_QUERIES if only is None or n in only
    ]
    rep_a = _run_worker("tr", "TR", args.sf_dir, only, args.report + ".a")
    # An empty narrowed set must SKIP leg B: _run_worker omits --only
    # for a falsy list, which would silently run the full registry.
    rep_b = (
        _run_worker("lt", "LT", args.sf_dir, string_queries, args.report + ".b")
        if string_queries
        else {}
    )

    flagged: dict[str, str] = {}
    audited = 0
    for name, entry in rep_a.items():
        if name.startswith("_"):
            continue
        audited += 1
        if entry["status"] != "match":
            flagged[name] = f"[tr_TR] {entry['status']}: " + entry.get(
                "detail", ""
            )[:300]
    for name in string_queries:
        b = rep_b.get(name)
        if b is None:
            flagged.setdefault(name, "missing from leg B report")
            continue
        if b["status"] != "match":
            flagged.setdefault(
                name, f"[lt_LT] {b['status']}: " + b.get("detail", "")[:300]
            )
        ha, hb = rep_a.get(name, {}).get("spark_hash"), b.get("spark_hash")
        if (
            not ha
            or not hb
            or str(ha).startswith("error:")
            or str(hb).startswith("error:")
        ):
            flagged.setdefault(
                name, f"no comparable hash: tr_TR={ha} lt_LT={hb}"
            )
        elif ha != hb:
            flagged.setdefault(
                name, f"cross-locale hash drift: tr_TR={ha} lt_LT={hb}"
            )
    print(
        f"\n# {audited} audited under tr_TR ({rep_a.get('_env')}), "
        f"{len(string_queries)} cross-checked vs lt_LT "
        f"({rep_b.get('_env')}), {len(flagged)} flagged"
    )
    for n, d in sorted(flagged.items()):
        print(f"--- {n}: {d}\n")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

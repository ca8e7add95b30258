#!/usr/bin/env python3
"""Build the 10x scale-rehearsal corpus (driver-side tooling, like
compare_oracle.py — NOT part of the Spark library).

Replicates sf0.1's documents/embeddings REPLICAS times into <outDir>:

- documents: replica r gets doc_id' = doc_id + r*ID_STRIDE; for r>0
  every 13th word is suffixed with the replica number, so each replica
  is a ~0.92-Jaccard near-duplicate of its original — the LSH dedup
  family (x02/x04/x13/x17/x27/x28/x30) sees realistic near-dup
  structure whose ANSWER grows with the corpus, not just its input.
- embeddings: replica r gets vec_id' = vec_id + r*ID_STRIDE with the
  embedding unchanged — every replica pair is a true semantic
  duplicate (cos = 1), the worst case for x05/x33/x37 candidate
  volume.

Deterministic (no RNG), so the Spark results at 10x remain
hash-comparable against DuckDB running the same oracle SQL on the
same parquet. Usage: build_sfbig.py [srcDir] [outDir] [replicas]
"""
import os
import sys

import duckdb

ID_STRIDE = 10_000_000


def main(src="/root/testdata/sf0.1", out="/tmp/sfbig", replicas=10,
         mode="neardup"):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    docs = os.path.join(src, "documents.parquet")
    embs = os.path.join(src, "embeddings.parquet")

    doc_parts = []
    for r in range(replicas):
        if r == 0:
            doc_parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{docs}')")
        else:
            # mode=neardup (default): suffix every 13th word with the
            # replica number -> jaccard vs the original ~ 12/13, safely
            # above the 0.8 word-LSH verify threshold, so each replica
            # IS a near-dup and cross-replica cliques make the pair
            # relation quadratic in replicas (what the capped-recall
            # dedup rehearsals want). mode=distinct: suffix every 3rd
            # word -> jaccard vs the original ~ 0.67 and ~ 0.5 between
            # two mutated replicas, both below 0.8, so replicas are NOT
            # near-dups of each other; each replica keeps ITS OWN copy
            # of the source corpus's internal dup structure, and the
            # pair relation grows LINEARLY in replicas (measured:
            # neardup pairs 256 -> 13,206 -> 1,195,136 at 1x/10x/100x —
            # 4,668x for 100x docs — which made x64's 100x row
            # output-quadratic by fixture construction). Mutation
            # computed once in the inner select; n_chars reads it.
            step = 13 if mode == "neardup" else 3
            doc_parts.append(f"""
                SELECT doc_id, text, lang, source,
                  CAST(len(text) AS BIGINT) AS n_chars
                FROM (
                  SELECT doc_id + {r * ID_STRIDE} AS doc_id,
                    array_to_string(list_transform(string_split(text, ' '),
                      (w, i) -> CASE WHEN i % {step} = 0
                                THEN concat(w, '{r}') ELSE w END), ' ') AS text,
                    lang, source
                  FROM read_parquet('{docs}'))""")
    con.sql(f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
            f"'{out}/documents.parquet' (FORMAT PARQUET)")

    emb_parts = [
        (f"SELECT vec_id + {r * ID_STRIDE} AS vec_id, embedding, label "
         f"FROM read_parquet('{embs}')")
        for r in range(replicas)]
    con.sql(f"COPY ({' UNION ALL '.join(emb_parts)}) TO "
            f"'{out}/embeddings.parquet' (FORMAT PARQUET)")

    # events scales too (round 7): replica r shifts user_id (and
    # event_id) by r*ID_STRIDE, keeping every per-user sequence intact
    # while multiplying key cardinality and per-window volume 10x - the
    # s-family BATCH TWINS (q13/q14/q15/x46) get real 10x rows. ts is
    # unchanged, so window boundaries and timeout semantics are
    # identical at both scales. DuckDB re-writes ts as plain TIMESTAMP
    # (micros), which both engines read natively - Tables.events'
    # nanos shim simply never fires for this fixture.
    evs = os.path.join(src, "events.parquet")
    ev_link = os.path.join(out, "events.parquet")
    if os.path.islink(ev_link):
        os.remove(ev_link)  # pre-round-7 layouts symlinked events
    ev_parts = [
        (f"SELECT event_id + {r * ID_STRIDE} AS event_id, ts, "
         f"user_id + {r * ID_STRIDE} AS user_id, event_type, value, props "
         f"FROM read_parquet('{evs}')")
        for r in range(replicas)]
    con.sql(f"COPY ({' UNION ALL '.join(ev_parts)}) TO "
            f"'{ev_link}' (FORMAT PARQUET)")

    # the remaining relational tables are not scaled (the rehearsal
    # targets the corpus + stream operators); symlink so Tables.* resolves
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        link = os.path.join(out, f"{t}.parquet")
        target = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(link) and os.path.exists(target):
            os.symlink(target, link)

    nd = con.sql(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    ne = con.sql(f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0]
    nv = con.sql(f"SELECT count(*) FROM read_parquet('{ev_link}')").fetchone()[0]
    print(f"built {out}: {nd} documents, {ne} embeddings, {nv} events "
          f"({replicas}x {src}, mode={mode})")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if len(a) > 0 else "/root/testdata/sf0.1",
         a[1] if len(a) > 1 else "/tmp/sfbig",
         int(a[2]) if len(a) > 2 else 10,
         a[3] if len(a) > 3 else "neardup")

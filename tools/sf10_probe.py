"""Generate a partial sf10 fixture (events + documents only — the tables
the three probe queries touch) and measure the probes at sf0.1/sf1/sf10."""
import json, os, subprocess, sys

sys.path.insert(0, "/root/repo")
SRC = "/root/testdata/sf0.1"
SF1 = "/root/repo/data/scale_sf1"
SF10 = "/root/repo/data/scale_sf10_probe"
COPIES = 100

def gen_partial():
    marker = os.path.join(SF10, f"_GENERATED_x{COPIES}_partial")
    if os.path.exists(marker):
        return
    import duckdb
    from dp3_spark import scale_gen as G
    con = duckdb.connect()
    counts = {
        "events": con.execute(f"select count(*) from '{SRC}/events.parquet'").fetchone()[0],
        "documents": con.execute(f"select count(*) from '{SRC}/documents.parquet'").fetchone()[0],
        "__max_user_id": con.execute(f"select max(user_id)+1 from '{SRC}/events.parquet'").fetchone()[0],
    }
    keyed = {
        "documents": {"doc_id": "documents"},
        "events": {"event_id": "events", "user_id": "__max_user_id"},
    }
    os.makedirs(SF10, exist_ok=True)
    for t, keys in keyed.items():
        tdir = f"{SF10}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        cols = [r[0] for r in con.execute(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
        for k in range(COPIES):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {k * counts[keys[c]]} as {c}")
                elif t == "documents" and c == "text":
                    sel.append(f"{G._translate_expr(k, 42)} as text")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (select {', '.join(sel)} from '{SRC}/{t}.parquet') TO "
                f"'{tdir}/part-{k:03d}.parquet' (FORMAT PARQUET)"
            )
        print(f"generated {t} x{COPIES}", flush=True)
    open(marker, "w").close()

def child(name, sf_dir, warmups):
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--one", name, sf_dir, str(warmups)],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"{name} @ {sf_dir} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])["sec"]

if __name__ == "__main__":
    gen_partial()
    out = {}
    for name in ["stat_range_served", "stat_quantiles_served", "search_bm25_indexed"]:
        out[name] = {}
        for label, d, w in [("sf0.1", SRC, 2), ("sf1", SF1, 1), ("sf10", SF10, 1)]:
            out[name][label] = child(name, d, w)
            print(f"{name} {label}: {out[name][label]:.3f}s", flush=True)
    json.dump(out, open("/tmp/sf10_results.json", "w"), indent=1)
    print(json.dumps(out))

import multiprocessing as mp, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXTS = None  # set in the parent pre-fork; shared copy-on-write

def _load_texts():
    """Same distribution as the scaling bench (pages_gen, seed 42)."""
    import duckdb
    from codegraph_rust_spark.sources.pages_gen import generate_pages
    d = "/tmp/host_probe_corpus"
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        generate_pages(d, n_docs=40_000, vocab_size=50_000, mean_len=120)
    return [r[0] or "" for r in duckdb.sql(
        f"select text from '{d}/pages.parquet/*.parquet'").fetchall()]

def tok(n):
    """The tokenize-stage kernel exactly as the Spark stage runs it:
    fused tokenize->stem->hash->count with a worker-local memo."""
    from codegraph_rust_spark.operators.xxhash import xxh64_str
    from codegraph_rust_spark.textkit.tokenizer import token_id_counts
    for t in TEXTS[:4000]:        # warm the memo (excluded from timing)
        token_id_counts(t, xxh64_str, "snowball")
    t0 = time.time()
    for t in TEXTS:
        token_id_counts(t, xxh64_str, "snowball")
    return time.time()-t0

def spin(n):
    t0=time.time(); x=0
    for i in range(20_000_000): x+=i
    return time.time()-t0

def stream(n):
    a = np.random.RandomState(1).randint(0, 1<<40, 8_000_000).astype(np.int64)
    t0=time.time()
    for _ in range(8):
        b = np.sort(a); c = b.cumsum(); a = (c % (1<<40)).astype(np.int64)
    return time.time()-t0

def run(fn, workers):
    with mp.Pool(workers) as p:
        walls = p.map(fn, range(workers))
    return sum(walls)/len(walls)

if __name__ == "__main__":
    # the TEXTS global reaches workers via copy-on-write, which only
    # holds under fork — pin it (spawn/forkserver defaults elsewhere
    # would give workers TEXTS=None and crash tok())
    mp.set_start_method("fork")
    lvls=(1,2,4,8,16)
    TEXTS = _load_texts()
    best={(k,w):1e9 for w in lvls for k in ("alu","mem","tok")}
    for rep in range(3):
        for w in lvls:
            best[("alu",w)]=min(best[("alu",w)], run(spin,w))
            best[("mem",w)]=min(best[("mem",w)], run(stream,w))
            best[("tok",w)]=min(best[("tok",w)], run(tok,w))
    for name in ("alu","mem","tok"):
        b=best[(name,1)]
        for w in lvls:
            v=best[(name,w)]
            print(f"{name} w={w:2d} per-worker={v:6.2f}s slowdown={v/b:4.2f}x agg-scale={w*b/v:5.2f}")

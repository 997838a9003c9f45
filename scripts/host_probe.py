import multiprocessing as mp, time
import numpy as np

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
    lvls=(1,2,4,8,16)
    best={("alu",w):1e9 for w in lvls} | {("mem",w):1e9 for w in lvls}
    for rep in range(3):
        for w in lvls:
            best[("alu",w)]=min(best[("alu",w)], run(spin,w))
            best[("mem",w)]=min(best[("mem",w)], run(stream,w))
    for name in ("alu","mem"):
        b=best[(name,1)]
        for w in lvls:
            v=best[(name,w)]
            print(f"{name} w={w:2d} per-worker={v:6.2f}s slowdown={v/b:4.2f}x agg-scale={w*b/v:5.2f}")

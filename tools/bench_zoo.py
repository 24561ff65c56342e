"""Throughput matrix over the reference-exact model zoo (VERDICT r4 item 3).

Runs cli/measure_throughput.py for every (geometry, model, batch) cell of
the reference's speed figure (README.md:224-236;
measure_throughput/__main__.py:284-343) and prints one summary line per
cell. Sequential subprocesses — one TPU program at a time; the persistent
compile cache amortizes repeated RQ-VAE geometries.

Run: python tools/bench_zoo.py            (real TPU, ~1 h)
Env: ZOO_SAMPLES (default 500), ZOO_LOOPS (default 3), ZOO_CELLS
     ("f,model,d,c,bs;...") to override the cell list.
"""

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    # f, model, d, c, bs  — f32-d4 x the 4 transformer sizes (bs100/200)
    (32, "huge", 4, 16384, 100), (32, "huge", 4, 16384, 200),
    (32, "large", 4, 16384, 100), (32, "large", 4, 16384, 200),
    (32, "medium", 4, 16384, 100), (32, "medium", 4, 16384, 200),
    (32, "small", 4, 16384, 100), (32, "small", 4, 16384, 200),
    # f16-d1 named VQGAN baselines
    (16, "vqgan_huge", 1, 16384, 100), (16, "vqgan_huge", 1, 16384, 200),
    (16, "vqgan_large", 1, 1024, 100), (16, "vqgan_large", 1, 1024, 200),
]


def main():
    cells = CELLS
    if os.environ.get("ZOO_CELLS"):
        cells = []
        for tok in os.environ["ZOO_CELLS"].split(";"):
            f, m, d, c, bs = tok.split(",")
            cells.append((int(f), m.strip(), int(d), int(c), int(bs)))
    samples = os.environ.get("ZOO_SAMPLES", "500")
    loops = os.environ.get("ZOO_LOOPS", "3")
    results = []
    for f, model, d, c, bs in cells:
        args = [
            sys.executable, os.path.join(REPO, "cli", "measure_throughput.py"),
            f"f={f}", f"model={model}", f"d={d}", f"c={c}",
            f"batch_size={bs}", f"samples_per_loop={samples}",
            f"n_loop={loops}", "warmup=1",
        ]
        t0 = time.time()
        r = subprocess.run(args, capture_output=True, text=True, timeout=3600)
        out = r.stdout + r.stderr
        m = re.search(r"\|\s*([\d.]+) ms/sample\s*$", out.strip().splitlines()[-1])
        tag = f"f{f}-{model}-d{d}-c{c}-bs{bs}"
        if r.returncode != 0 or not m:
            print(f"ZOO {tag}: FAILED ({time.time()-t0:.0f}s)\n"
                  + out[-600:], flush=True)
            results.append((tag, None))
            continue
        # also grab the last per-loop ar/decode split
        split = re.findall(r"\(ar: ([\d.]+), decode: ([\d.]+)\)", out)
        ar, dec = split[-1] if split else ("?", "?")
        print(f"ZOO {tag}: {m.group(1)} ms/sample (ar {ar}, decode {dec}) "
              f"[{time.time()-t0:.0f}s]", flush=True)
        results.append((tag, float(m.group(1))))
    print("\n# summary")
    for tag, v in results:
        print(f"{tag}: {v if v is not None else 'FAILED'}")


if __name__ == "__main__":
    main()

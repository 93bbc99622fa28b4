"""Scale the native decode stack an order of magnitude past the round-2
probe (500-word bigram, 7.8k states / 266k arcs): a multi-thousand-word
lexicon with a SPARSE trigram LM estimated from a sampled corpus
(Witten-Bell-flavoured backoff, standard ARPA), through the n-gram
history-state graph expansion (decode/graph.py build_decoding_graph_ngram)
and the native decoders (VERDICT r3 item 7 — graph size, build time,
memory, beam/RTF, determinization behavior at LVCSR-ish scale).

The acoustic side is synthetic (Gaussian emissions around per-pdf means,
exact log-likelihoods) so WER measures SEARCH behavior, not AM quality.

Usage:
  python tools_dev/bench_decode_scale.py [vocab] [train_sents] [test_utts]
Defaults 5000 / 40000 / 20. Runs on CPU (no TPU claim needed):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python ...
"""

import math
import resource
import sys
import time

import numpy as np

from kaldi_lstm_tpu.decode.faster import decode_faster
from kaldi_lstm_tpu.decode.lattice_faster import decode_lattice_faster
from kaldi_lstm_tpu.decode.determinize import determinize_lattice
from kaldi_lstm_tpu.decode.graph import build_graph_from_arpa
from kaldi_lstm_tpu.decode.wer import edit_distance
from kaldi_lstm_tpu.io.lang import SymbolTable
from kaldi_lstm_tpu.io.transition_model import \
    make_monophone_transition_model

V = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
NSENT = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
NTEST = int(sys.argv[3]) if len(sys.argv) > 3 else 20
NPHONE = 40
STATES_PER_PHONE = 3
FEAT_DIM = 24
BRANCH = 16          # successors per word: controls LM sparsity
EMIT_NOISE = 0.55
BOS, EOS = "<s>", "</s>"

rng = np.random.RandomState(0)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


# ---------------------------------------------------------------------------
# language: lexicon + sparse successor process + counted trigram ARPA
# ---------------------------------------------------------------------------

t0 = time.perf_counter()
vocab = [f"w{i:05d}" for i in range(V)]
lex = {}
seen = set()
for w in vocab:
    while True:
        n = rng.randint(3, 8)
        pron = tuple(rng.randint(2, NPHONE + 1, n))
        if pron not in seen:
            seen.add(pron)
            break
    lex[w] = [list(pron)]

# sparse Markov word process: each word (and BOS) has BRANCH successors
succ = {}
for w in [BOS] + vocab:
    ids = rng.choice(V, BRANCH, replace=False)
    probs = rng.dirichlet(np.ones(BRANCH) * 0.5)
    succ[w] = ([vocab[i] for i in ids], probs)
EOS_P = 0.12


def sample_sentence(r):
    out, h = [], BOS
    while len(out) < 18:
        if out and r.rand() < EOS_P:
            break
        ws, ps = succ[h]
        h = ws[r.choice(BRANCH, p=ps)]
        out.append(h)
    return out


sents = [sample_sentence(rng) for _ in range(NSENT)]
# guarantee full vocab coverage for the unigram table
sents += [[w] for w in vocab]

c1, c2, c3 = {}, {}, {}
ntok = 0
for s in sents:
    toks = [BOS] + s + [EOS]
    for w in toks[1:]:
        c1[w] = c1.get(w, 0) + 1
        ntok += 1
    for a, b in zip(toks, toks[1:]):
        c2[(a, b)] = c2.get((a, b), 0) + 1
    for a, b, c in zip(toks, toks[1:], toks[2:]):
        c3[(a, b, c)] = c3.get((a, b, c), 0) + 1

# Witten-Bell-ish backoff estimation, normalized per history:
#   p(w|h) = (1 - gam) * c(hw)/c(h) for seen w
#   bo(h)  = gam / (1 - sum_seen p_lower(w|h'))
GAM = 0.15
LOG10 = math.log(10.0)

uni_p = {w: c / ntok for w, c in c1.items()}      # sums to 1 over c1


def _hist_counts(cn):
    h = {}
    for k, c in cn.items():
        h[k[:-1]] = h.get(k[:-1], 0) + c
    return h


h2, h3 = _hist_counts(c2), _hist_counts(c3)


def p2(a, b):
    c = c2.get((a, b))
    if c:
        return (1 - GAM) * c / h2[(a,)]
    return bo2.get((a,), GAM) * uni_p.get(b, 1e-12)


bo2 = {}
# per history, sum of unigram mass of its seen continuation words
seen2 = {}
for (a, b), c in c2.items():
    seen2.setdefault(a, []).append(b)
for a, ws in seen2.items():
    s_low = sum(uni_p.get(w, 0.0) for w in ws)
    bo2[(a,)] = GAM / max(1e-9, 1.0 - s_low)

seen3 = {}
for (a, b, c), n in c3.items():
    seen3.setdefault((a, b), []).append(c)
bo3 = {}
for (a, b), ws in seen3.items():
    s_low = sum(p2(b, w) for w in ws)
    bo3[(a, b)] = GAM / max(1e-9, 1.0 - min(0.999, s_low))

arpa = ["\\data\\",
        f"ngram 1={len(c1) + 1}",
        f"ngram 2={len(c2)}",
        f"ngram 3={len(c3)}",
        "", "\\1-grams:"]
arpa.append(f"-99\t{BOS}\t{math.log10(bo2.get((BOS,), GAM))}")
for w, p in uni_p.items():
    bo = bo2.get((w,))
    line = f"{math.log10(max(p * (1 - GAM), 1e-12)):.6f}\t{w}"
    if bo is not None:
        line += f"\t{math.log10(bo):.6f}"
    arpa.append(line)
arpa += ["", "\\2-grams:"]
for (a, b), c in c2.items():
    lp = math.log10((1 - GAM) * c / h2[(a,)])
    bo = bo3.get((a, b))
    line = f"{lp:.6f}\t{a} {b}"
    if bo is not None:
        line += f"\t{math.log10(bo):.6f}"
    arpa.append(line)
arpa += ["", "\\3-grams:"]
for (a, b, c), n in c3.items():
    lp = math.log10((1 - GAM) * n / h3[(a, b)])
    arpa.append(f"{lp:.6f}\t{a} {b} {c}")
arpa += ["", "\\end\\"]

import tempfile, os
d = tempfile.mkdtemp(prefix="klt_scale_")
arpa_path = os.path.join(d, "lm.arpa")
with open(arpa_path, "w") as f:
    f.write("\n".join(arpa) + "\n")
print(f"language: vocab {V}, {len(c2)} bigrams, {len(c3)} trigrams, "
      f"corpus {NSENT} sents; built in {time.perf_counter() - t0:.1f}s; "
      f"ARPA {os.path.getsize(arpa_path) / 1e6:.1f} MB", flush=True)

# ---------------------------------------------------------------------------
# graph
# ---------------------------------------------------------------------------

tm = make_monophone_transition_model(NPHONE, STATES_PER_PHONE, 0.6)
words = SymbolTable()
words.add("<eps>", 0)
for w in vocab:
    words.add(w)

t0 = time.perf_counter()
graph = build_graph_from_arpa(tm, lex, arpa_path, words=words)
t_build = time.perf_counter() - t0
narcs = sum(len(a) for a in graph.arcs)
print(f"graph: {graph.num_states} states, {narcs} arcs, "
      f"built in {t_build:.1f}s, RSS {rss_gb():.1f} GB", flush=True)

from kaldi_lstm_tpu.decode.faster import compile_graph
t0 = time.perf_counter()
cg = compile_graph(graph)
print(f"compile_graph (CSR): {time.perf_counter() - t0:.1f}s, "
      f"RSS {rss_gb():.1f} GB", flush=True)

# ---------------------------------------------------------------------------
# synthetic test utterances + exact Gaussian log-likelihoods
# ---------------------------------------------------------------------------

means = np.random.RandomState(42).randn(tm.num_pdfs, FEAT_DIM) \
    .astype(np.float32)
SL = 0.6

tests = []
for i in range(NTEST):
    sent = sample_sentence(rng) or [vocab[0]]
    pdfs = []
    for w in sent:
        for ph in lex[w][0]:
            for s in range(STATES_PER_PHONE):
                pdf = (ph - 1) * STATES_PER_PHONE + s
                pdfs.append(pdf)
                while rng.rand() < SL:
                    pdfs.append(pdf)
    feats = means[pdfs] + rng.randn(len(pdfs), FEAT_DIM) * EMIT_NOISE
    # exact Gaussian log-liks: -0.5*||f - mu_k||^2 / sigma^2 (+const)
    d2 = ((feats[:, None, :] - means[None, :, :]) ** 2).sum(-1)
    llk = -0.5 * d2 / (EMIT_NOISE ** 2)
    tests.append((sent, llk.astype(np.float64)))

audio_s = sum(t[1].shape[0] for t in tests) / 100.0
print(f"test set: {NTEST} utts, {audio_s:.1f} audio-s "
      f"(frames {int(audio_s * 100)})", flush=True)


def wer_of(hyps):
    err = tot = 0
    for (ref, _), hyp in zip(tests, hyps):
        err += edit_distance(ref, hyp).errors
        tot += len(ref)
    return 100.0 * err / max(tot, 1)


# ---------------------------------------------------------------------------
# decode_faster beam sweep
# ---------------------------------------------------------------------------

for beam in (10.0, 13.0, 16.0):
    t0 = time.perf_counter()
    hyps = []
    for sent, llk in tests:
        res = decode_faster(graph, llk, acoustic_scale=1.0, beam=beam)
        hyps.append([words.id2sym[i] for i in res.words])
    dt = time.perf_counter() - t0
    print(f"decode_faster beam {beam}: {dt:.1f}s for {audio_s:.0f} "
          f"audio-s (RTF {dt / audio_s:.3f}, {audio_s / dt:.0f}x RT), "
          f"%WER {wer_of(hyps):.2f}, RSS {rss_gb():.1f} GB", flush=True)

# ---------------------------------------------------------------------------
# latgen + determinize
# ---------------------------------------------------------------------------

t0 = time.perf_counter()
t_det = 0.0
hyps = []
lat_arcs = det_states = 0
for sent, llk in tests:
    lat = decode_lattice_faster(graph, llk, acoustic_scale=1.0,
                                beam=13.0, lattice_beam=7.0)
    lat_arcs += sum(len(a) for a in lat.arcs)
    t1 = time.perf_counter()
    clat = determinize_lattice(lat)
    t_det += time.perf_counter() - t1
    det_states += len(clat.arcs)
    from kaldi_lstm_tpu.io.lattice import lattice_best_path
    words_ids, _, _ = lattice_best_path(clat)
    hyps.append([words.id2sym[i] for i in words_ids])
dt = time.perf_counter() - t0
print(f"latgen beam 13/7 + determinize: {dt:.1f}s total "
      f"(determinize {t_det:.1f}s) RTF {dt / audio_s:.3f}, "
      f"%WER {wer_of(hyps):.2f}, raw-lat arcs {lat_arcs}, "
      f"det-lat states {det_states}, RSS {rss_gb():.1f} GB", flush=True)

# ---------------------------------------------------------------------------
# the classic LVCSR flow at scale: decode+latgen through the STEP-DOWN
# BIGRAM graph, then exact trigram lattice rescore — vs direct trigram
# ---------------------------------------------------------------------------

from kaldi_lstm_tpu.decode.graph import build_decoding_graph
from kaldi_lstm_tpu.io.arpa import ArpaBigram, ArpaLM
from kaldi_lstm_tpu.io.lattice import lattice_best_path, lattice_lmrescore

lm_full = ArpaLM.load(arpa_path)
lm_bi = ArpaBigram()
lm_bi.unigram = {w: v for (w,), v in lm_full.ngrams.get(1, {}).items()}
lm_bi.bigram = {k: lp for k, (lp, _bo) in lm_full.ngrams.get(2, {}).items()}
t0 = time.perf_counter()
g_bi = build_decoding_graph(tm, lex, lm_bi, words=words)
print(f"bigram graph: {g_bi.num_states} states, "
      f"{sum(len(a) for a in g_bi.arcs)} arcs, built in "
      f"{time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
t_resc = 0.0
hyps = []
for sent, llk in tests:
    lat = decode_lattice_faster(g_bi, llk, acoustic_scale=1.0,
                                beam=16.0, lattice_beam=8.0)
    clat = determinize_lattice(lat)
    t1 = time.perf_counter()
    res = lattice_lmrescore(clat, lm_bi, lm_full, words)
    t_resc += time.perf_counter() - t1
    ids, _, _ = lattice_best_path(res)
    hyps.append([words.id2sym[i] for i in ids])
dt = time.perf_counter() - t0
print(f"bigram latgen + exact trigram rescore: {dt:.1f}s "
      f"(rescore {t_resc:.1f}s) RTF {dt / audio_s:.3f}, "
      f"%WER {wer_of(hyps):.2f}, RSS {rss_gb():.1f} GB", flush=True)
print("done", flush=True)

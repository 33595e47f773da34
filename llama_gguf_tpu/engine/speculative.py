"""Speculative decoding: draft-model and self-speculative (early-exit) modes.

Parity target: /root/reference/src/model/speculative.rs:17-525
(SpeculativeMode::{DraftModel,SelfSpeculative}, generate:135,
generate_self_speculative:275, SpeculativeStats acceptance tracking).

TPU-native design: the verification forward over the K drafted tokens is ONE
batched jitted step ([1, K] tokens with per-token positions) — the MXU
verifies all draft positions in a single pass, whereas the reference verifies
sequentially. Rollback on rejection is free: rejected cache positions are
masked by the per-sequence length until overwritten, so no KV copy happens.

Self-speculation shares weights: the draft is the same params pytree with
only the first N layers (arrays aliased, no copy) — the analogue of the
reference's early-exit mode, with zero extra HBM for weights.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .runner import ModelRunner, bucket_len

log = logging.getLogger(__name__)


@dataclass
class SpeculativeStats:
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0
    bonus: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0

    @property
    def tokens_per_round(self) -> float:
        total = self.accepted + self.bonus
        return total / self.rounds if self.rounds else 0.0


def make_self_draft(runner: ModelRunner, exit_layer: int) -> ModelRunner:
    """Early-exit draft: same weights, first ``exit_layer`` layers only
    (parity: SelfSpeculative mode). Arrays are aliased — no weight copy."""
    params = dict(runner.params)
    params["layers"] = runner.params["layers"][:exit_layer]
    cfg = dataclasses.replace(
        runner.cfg, num_layers=exit_layer,
        layer_kinds=tuple(runner.cfg.layer_kinds[:exit_layer])
        if runner.cfg.layer_kinds else (),
    )
    return ModelRunner(params, cfg, max_batch=runner.max_batch,
                       max_seq=runner.max_seq, kv_dtype=runner.kv_dtype,
                       matmul_precision=runner.matmul_precision,
                       kv_format=runner.kv_format)


def _window_dev(runner: ModelRunner, tokens: list[int], start_pos: int,
                kv: dict) -> tuple[jnp.ndarray, dict]:
    """One jitted step consuming ``tokens`` at positions start_pos...;
    returns (DEVICE logits [len(tokens), V], kv) — callers that only need
    token ids argmax on device and fetch k ints instead of a [t, V] logits
    slab (4 MB/round at 8B over the 2-6 ms/call tunnel)."""
    t = len(tokens)
    b = runner.max_batch
    bt = bucket_len(t)
    toks = np.zeros((b, bt), np.int32)
    toks[0, :t] = tokens
    pos = np.full((b, bt), runner.max_seq, np.int32)
    pos[0, :t] = start_pos + np.arange(t)
    lengths = np.zeros((b,), np.int32)
    lengths[0] = start_pos + t
    from .runner import read_bucket

    logits, kv = runner.step(jnp.asarray(toks), jnp.asarray(pos),
                             jnp.asarray(lengths), kv,
                             read_bound=read_bucket(start_pos + t,
                                                    runner.max_seq))
    return logits[0, :t], kv


def _window(runner: ModelRunner, tokens: list[int], start_pos: int,
            kv: dict) -> tuple[np.ndarray, dict]:
    """_window_dev with a host fetch (sampled paths need full rows)."""
    logits, kv = _window_dev(runner, tokens, start_pos, kv)
    return np.asarray(logits), kv


def _draft_greedy_on_device(draft: ModelRunner, tail: list[int], nd: int,
                            dkv: dict, k: int) -> tuple[list[int], dict]:
    """Draft k greedy tokens with ONE window step + ONE on-device greedy
    scan + ONE k-int fetch. The round-2 host loop paid a decode_one
    dispatch plus a full-logits fetch per draft token (2-6 ms each over
    the tunnel) — at 8B that cost more wall time than speculation saved."""
    dlog, dkv = _window_dev(draft, tail, nd, dkv)
    nd_new = nd + len(tail)
    b = draft.max_batch
    t0 = jnp.zeros((b,), jnp.int32).at[0].set(
        jnp.argmax(dlog[-1]).astype(jnp.int32))
    if k > 1:
        pos0 = jnp.full((b,), nd_new, jnp.int32)
        rest, dkv = draft.greedy_decode(t0, pos0, dkv, steps=k - 1)
        drafts_dev = jnp.concatenate([t0[:1], rest[0]])
    else:
        drafts_dev = t0[:1]
    return [int(x) for x in np.asarray(drafts_dev)], dkv


class SpeculativeDecoder:
    """K-token draft + single-pass target verification.

    Invariant: ``hist`` is the accepted token stream (prompt + generated);
    nt/nd count how many of hist the target/draft models have consumed into
    their KV caches. hist[nt:] is exactly the unconsumed tail (always
    non-empty after prefill: the latest accepted token).
    """

    def __init__(self, target: ModelRunner, draft: ModelRunner,
                 num_draft: int = 4):
        self.target = target
        self.draft = draft
        self.k = num_draft
        self.stats = SpeculativeStats()

    @classmethod
    def self_speculative(cls, target: ModelRunner, exit_layer: int | None = None,
                         num_draft: int = 4) -> "SpeculativeDecoder":
        n = exit_layer or max(1, target.cfg.num_layers // 4)
        return cls(target, make_self_draft(target, n), num_draft=num_draft)

    def generate_greedy(self, prompt_ids: list[int], max_tokens: int,
                        is_eog=None) -> list[int]:
        """Greedy speculative decode; the output is IDENTICAL to plain
        greedy decoding of the target model (verification guarantees it)."""
        tkv = self.target.init_kv()
        dkv = self.draft.init_kv()

        hist = list(prompt_ids)
        tlogits, tkv, _ = self.target.prefill(prompt_ids, tkv)
        nt = len(prompt_ids)
        _, dkv, _ = self.draft.prefill(prompt_ids, dkv)
        nd = len(prompt_ids)

        first = int(np.argmax(np.asarray(tlogits)))
        hist.append(first)
        out = [first]
        if is_eog and is_eog(first):
            return out

        max_seq = self.target.max_seq
        while len(out) < max_tokens and len(hist) + self.k + 1 < max_seq:
            k = min(self.k, max_tokens - len(out))

            # -- draft: consume the unconsumed tail, then draft k tokens —
            # one window step + one on-device greedy scan + one k-int fetch
            # (the draft cache consumes drafts[:k-1] at positions
            # nd..nd+k-2; those entries stay valid exactly for the
            # accepted prefix)
            drafts, dkv = _draft_greedy_on_device(
                self.draft, hist[nd:], nd, dkv, k)
            nd = len(hist)
            nd_base = nd
            nd = nd + k - 1
            self.stats.drafted += k

            # -- verify: one target pass over [tail..., drafts[:-1]];
            # argmax on device, fetch k ints (not a [k, V] logits slab)
            window = hist[nt:] + drafts[:-1]
            start = nt
            vlogits, tkv = _window_dev(self.target, window, start, tkv)
            nt = start + len(window)
            # logits rows for the last k window tokens verify drafts[0..k-1]
            greedy = np.asarray(jnp.argmax(vlogits[-k:], axis=-1))

            accepted = 0
            for i in range(k):
                if drafts[i] == int(greedy[i]):
                    accepted += 1
                else:
                    break
            self.stats.accepted += accepted
            self.stats.rounds += 1

            new_tokens = drafts[:accepted]
            if accepted < k:
                new_tokens = new_tokens + [int(greedy[accepted])]
                self.stats.bonus += 1
                # roll back both caches to the accepted prefix
                nt = len(hist) + accepted  # consumed tail + accepted drafts
                nd = min(nd, nd_base + accepted)
            # accepted == k: everything consumed is valid;
            # drafts[k-1] becomes the unconsumed tail

            stop = False
            for tok in new_tokens:
                hist.append(tok)
                out.append(tok)
                if (is_eog and is_eog(tok)) or len(out) >= max_tokens:
                    stop = True
                    break
            if stop:
                break
        return out

    def generate_sampled(self, prompt_ids: list[int], max_tokens: int,
                         sampler_config, seed: int | None = None,
                         is_eog=None) -> list[int]:
        """Stochastic speculative sampling (parity: speculative.rs
        acceptance sampling): draft token x accepted with probability
        min(1, p_target(x)/p_draft(x)); on rejection, resample from
        norm(max(0, p_target - p_draft)). The output distribution equals
        sampling the target directly."""
        from ..sampling.sampler import Sampler

        if getattr(sampler_config, "mirostat", 0):
            raise ValueError(
                "speculative sampling is incompatible with Mirostat (its "
                "state adapts per observed token); use plain decoding")
        tgt_sampler = Sampler(sampler_config)
        dft_sampler = Sampler(sampler_config)
        rng = np.random.default_rng(seed)

        tkv = self.target.init_kv()
        dkv = self.draft.init_kv()
        hist = list(prompt_ids)
        tlogits, tkv, _ = self.target.prefill(prompt_ids, tkv)
        nt = len(prompt_ids)
        _, dkv, _ = self.draft.prefill(prompt_ids, dkv)
        nd = len(prompt_ids)

        p0 = tgt_sampler.probs(np.asarray(tlogits), hist)
        first = int(rng.choice(p0.shape[0], p=p0))
        hist.append(first)
        out = [first]
        if is_eog and is_eog(first):
            return out

        max_seq = self.target.max_seq
        while len(out) < max_tokens and len(hist) + self.k + 1 < max_seq:
            k = min(self.k, max_tokens - len(out))

            dlog, dkv = _window(self.draft, hist[nd:], nd, dkv)
            nd = len(hist)
            drafts: list[int] = []
            draft_probs: list[np.ndarray] = []
            cur_logits = dlog[-1]
            for i in range(k):
                p = dft_sampler.probs(cur_logits, hist + drafts)
                tok = int(rng.choice(p.shape[0], p=p))
                drafts.append(tok)
                draft_probs.append(p)
                if i < k - 1:
                    dlog1, dkv = self.draft.decode_one(tok, nd + i, dkv)
                    cur_logits = np.asarray(dlog1)
            nd_base = nd
            nd = nd + k - 1
            self.stats.drafted += k

            # one target pass over [tail..., drafts] -> k+1 rows; row i
            # gives p_target at the position of drafts[i], the last row the
            # distribution after all k drafts
            window = hist[nt:] + drafts
            start = nt
            vlogits, tkv = _window(self.target, window, start, tkv)
            nt = start + len(window)
            trows = vlogits[-(k + 1):]

            accepted = 0
            resampled: int | None = None
            for i in range(k):
                pt = tgt_sampler.probs(trows[i], hist + drafts[:i])
                pd = draft_probs[i]
                x = drafts[i]
                ratio = pt[x] / pd[x] if pd[x] > 0 else 0.0
                if rng.random() < min(1.0, ratio):
                    accepted += 1
                    continue
                residual = np.maximum(pt - pd, 0.0)
                tot = residual.sum()
                if tot <= 0:
                    residual, tot = pt, pt.sum()
                resampled = int(rng.choice(residual.shape[0],
                                           p=residual / tot))
                break
            self.stats.accepted += accepted
            self.stats.rounds += 1

            new_tokens = drafts[:accepted]
            if resampled is not None:
                new_tokens = new_tokens + [resampled]
                self.stats.bonus += 1
                nt = len(hist) + accepted
                nd = min(nd, nd_base + accepted)
            else:
                # all accepted: bonus token from the last target row
                pt = tgt_sampler.probs(trows[k], hist + drafts)
                new_tokens = new_tokens + [int(rng.choice(pt.shape[0], p=pt))]
                self.stats.bonus += 1

            stop = False
            for tok in new_tokens:
                hist.append(tok)
                out.append(tok)
                if (is_eog and is_eog(tok)) or len(out) >= max_tokens:
                    stop = True
                    break
            if stop:
                break
        return out

    # -- convenience -----------------------------------------------------------

    def generate_plain_greedy(self, prompt_ids: list[int],
                              max_tokens: int) -> list[int]:
        """Non-speculative greedy on the target (for parity checks)."""
        kv = self.target.init_kv()
        logits, kv, pos = self.target.prefill(prompt_ids, kv)
        out = []
        for _ in range(max_tokens):
            tok = int(np.argmax(np.asarray(logits)))
            out.append(tok)
            if pos >= self.target.max_seq - 1 or len(out) >= max_tokens:
                break
            logits, kv = self.target.decode_one(tok, pos, kv)
            pos += 1
        return out


class PromptLookupDecoder:
    """Draft-model-free speculation: proposals are copied from earlier
    occurrences of the current suffix n-gram in the context ("prompt
    lookup" / n-gram speculation). High win on RAG, code editing and
    summarization, where the output quotes long input spans verbatim; zero
    extra HBM and no draft forward — the only cost is the same single-pass
    batched verification step `SpeculativeDecoder` uses. Exactness is
    guaranteed by verification regardless of proposal quality.

    No reference equivalent (/root/reference/src/model/speculative.rs has
    draft-model and early-exit modes only); llama.cpp's
    examples/lookahead/lookup is the analogue.
    """

    def __init__(self, target: ModelRunner, num_draft: int = 8,
                 max_ngram: int = 3):
        self.target = target
        self.k = num_draft
        self.max_ngram = max_ngram
        self.stats = SpeculativeStats()

    def _propose(self, hist: list[int], k: int) -> list[int]:
        """Longest-suffix n-gram match: for n = max_ngram..1, find the most
        recent earlier occurrence of hist[-n:]; propose up to k tokens that
        followed it."""
        length = len(hist)
        if length < 2 or k <= 0:
            return []
        h = np.asarray(hist, np.int64)
        for n in range(min(self.max_ngram, length - 1), 0, -1):
            pat = h[length - n:]
            body = h[: length - 1]  # candidate windows strictly before the suffix
            if body.shape[0] < n:
                continue
            win = np.lib.stride_tricks.sliding_window_view(body, n)
            hits = np.nonzero((win == pat).all(axis=1))[0]
            if hits.size == 0:
                continue
            i = int(hits[-1])  # most recent occurrence
            cont = hist[i + n : i + n + k]
            if cont:
                return cont
        return []

    def generate_greedy(self, prompt_ids: list[int], max_tokens: int,
                        is_eog=None) -> list[int]:
        """Greedy prompt-lookup decode; output is IDENTICAL to plain greedy
        decoding of the target (single-pass verification, same invariants
        as SpeculativeDecoder.generate_greedy)."""
        tkv = self.target.init_kv()
        hist = list(prompt_ids)
        tlogits, tkv, _ = self.target.prefill(prompt_ids, tkv)
        nt = len(prompt_ids)

        first = int(np.argmax(np.asarray(tlogits)))
        hist.append(first)
        out = [first]
        if is_eog and is_eog(first):
            return out

        max_seq = self.target.max_seq
        while len(out) < max_tokens and len(hist) + self.k + 1 < max_seq:
            drafts = self._propose(hist, min(self.k, max_tokens - len(out)))
            k = len(drafts)
            window = hist[nt:] + (drafts[:-1] if k else [])
            vlogits, tkv = _window_dev(self.target, window, nt, tkv)
            nt += len(window)
            self.stats.rounds += 1
            self.stats.drafted += k

            if k == 0:  # no n-gram match: plain single-token step
                new_tokens = [int(jnp.argmax(vlogits[-1]))]
                self.stats.bonus += 1
            else:
                # argmax on device; fetch k ints, not a [k, V] logits slab
                greedy = np.asarray(jnp.argmax(vlogits[-k:], axis=-1))
                accepted = 0
                for i in range(k):
                    if drafts[i] == int(greedy[i]):
                        accepted += 1
                    else:
                        break
                self.stats.accepted += accepted
                new_tokens = drafts[:accepted]
                if accepted < k:
                    new_tokens = new_tokens + [int(greedy[accepted])]
                    self.stats.bonus += 1
                    nt = len(hist) + accepted  # roll back to accepted prefix
                # accepted == k: drafts[k-1] stays the unconsumed tail

            stop = False
            for tok in new_tokens:
                hist.append(tok)
                out.append(tok)
                if (is_eog and is_eog(tok)) or len(out) >= max_tokens:
                    stop = True
                    break
            if stop:
                break
        return out

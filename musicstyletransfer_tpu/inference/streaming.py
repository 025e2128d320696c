"""Slot-based continuous batching: iteration-level request admission.

The micro-batch service (inference/service.py) forms a whole batch, runs
the full fused transfer call, and only then admits new work — a request
arriving just after a batch starts waits out the entire previous cycle
(~a full decode budget) before its own begins. This engine replaces the
batch boundary with SLOTS: a fixed number of independent generation lanes
whose KV caches live in one set of donated device buffers, advanced
``segment_steps`` decode positions per dispatch. New requests are encoded
and spliced into free slots between segments, so admission granularity is
one segment (~a few ms of decode) instead of one batch.

This is the TPU-native shape of vLLM-style continuous batching: static
shapes everywhere (S slots, fixed cache length, fixed admit width), per-row
ragged positions (models/transformer.py::step_ragged) instead of dynamic
batch membership, and state that never leaves the device — the host only
fetches the small per-slot readouts (done flags, positions, token rows)
each segment.

Semantics match the service path: each request is style-transferred into
EVERY target class (reference sampler.py:93-104 — the encoder also sees
the target class), deterministic encode (z = mu), per-sequence EOS stop,
generation budget 2x the input length (reference sampler.py:164). A
request completes when all of its per-class units do.

Trade-off (measured in BASELINE.md): the batch service amortizes dispatch
over a whole decode budget and rides the fused Pallas kernel, so its
THROUGHPUT ceiling is higher; this engine bounds request LATENCY at
moderate load — pick per deployment, both ship.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..midi import smf
from ..midi.codec import MelodyWriter, melody_from_ids, tokenize_track
from ..midi.vocab import EOS_ID, PAD_ID, SOS_ID
from ..models.transformer import Cache
from ..models.vae import StyleVAE
from .decode import _filter_logits
from .sampler import load_inference_model
from .service import ServiceStats, TransferResult


class SlotState(NamedTuple):
    """Device-resident engine state (donated through every dispatch)."""

    cache: Cache  # per-layer (k, v): [S, T_cache, H, hd]
    seqs: jax.Array  # [S, T_gen] int32; position 0 = SOS
    scores: jax.Array  # [S] f32 accumulated -log p
    t: jax.Array  # [S] int32 next cache position to write
    budget: jax.Array  # [S] int32 generation budget (max positions)
    done: jax.Array  # [S] bool
    occupied: jax.Array  # [S] bool


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("slots", "t_gen", "t_cache"))
def _init_state(model: StyleVAE, params, slots: int, t_gen: int,
                t_cache: int) -> SlotState:
    dummy_z = jnp.zeros(
        (slots, model.config.encoder_config.latent_dim), jnp.float32
    )
    dummy_classes = jnp.zeros((slots,), jnp.int32)
    cache = model.apply(
        {"params": params}, dummy_z, dummy_classes, t_cache,
        method=StyleVAE.decode_prefill,
    )
    return SlotState(
        cache=cache,
        seqs=jnp.full((slots, t_gen), PAD_ID, jnp.int32).at[:, 0].set(SOS_ID),
        scores=jnp.zeros((slots,), jnp.float32),
        t=jnp.ones((slots,), jnp.int32),
        budget=jnp.zeros((slots,), jnp.int32),
        done=jnp.zeros((slots,), bool),
        occupied=jnp.zeros((slots,), bool),
    )


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _admit(
    model: StyleVAE,
    params,
    state: SlotState,
    tokens: jax.Array,  # [A, L+1] SOS-prefixed
    seq_lens: jax.Array,  # [A]
    classes: jax.Array,  # [A] target class per unit
    slot_sel: jax.Array,  # [A, S] f32 one-hot; all-zero row = padding
    budgets: jax.Array,  # [A] int32
) -> SlotState:
    """Encode up to A new (request, class) units and splice them into the
    selected slots: write the conditioning state's position-0 K/V, reset the
    slot's token row / score / position / budget. ``slot_sel`` rows are
    one-hot over DISTINCT slots (host-guaranteed); padding rows are all-zero
    so they select and reset nothing.
    """
    S = state.seqs.shape[0]
    mu, _ = model.apply(
        {"params": params}, tokens, seq_lens, classes, method=StyleVAE.encode
    )
    # Position-0 K/V of each unit's conditioning state, via a 1-position
    # prefill on a scratch cache (same math as the batch path's prefill).
    small = model.apply(
        {"params": params}, mu, classes, 1, method=StyleVAE.decode_prefill
    )
    written = jnp.sum(slot_sel, axis=0) > 0.0  # [S]

    new_cache = []
    for (ck, cv), (sk, sv) in zip(state.cache, small):
        # One-hot matmul scatter (collision-free by contract): exact — each
        # written slot row is 1.0 x one source row, f32 accumulation.
        def splice(big, small_kv):
            A = small_kv.shape[0]
            flat = small_kv[:, 0].reshape(A, -1).astype(jnp.float32)
            rows = jnp.dot(slot_sel.T, flat,
                           preferred_element_type=jnp.float32)
            rows = rows.reshape((S,) + big.shape[2:]).astype(big.dtype)
            row0 = jnp.where(written[:, None, None], rows, big[:, 0])
            return big.at[:, 0].set(row0)

        new_cache.append((splice(ck, sk), splice(cv, sv)))

    sos_row = jnp.full_like(state.seqs[0], PAD_ID).at[0].set(SOS_ID)
    new_budget = jnp.dot(
        slot_sel.T, budgets.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    return SlotState(
        cache=tuple(new_cache),
        seqs=jnp.where(written[:, None], sos_row[None, :], state.seqs),
        scores=jnp.where(written, 0.0, state.scores),
        t=jnp.where(written, 1, state.t),
        budget=jnp.where(written, new_budget, state.budget),
        done=jnp.where(written, False, state.done),
        occupied=state.occupied | written,
    )


@functools.partial(
    jax.jit, static_argnums=(0,), donate_argnums=(2,),
    static_argnames=("segment_steps", "top_k", "top_p", "greedy"),
)
def _segment(
    model: StyleVAE,
    params,
    state: SlotState,
    rng: jax.Array,
    temperature: jax.Array,
    segment_steps: int,
    top_k: int = 0,
    top_p: float = 0.0,
    greedy: bool = False,
) -> Tuple[SlotState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Advance every live slot ``segment_steps`` decode positions.

    Done/empty slots still ride the batched math (static shapes) but their
    writes are masked out. Returns (state, seqs, t, done, scores); the
    readouts may ALIAS the state buffers (which are donated into the next
    dispatch), so the host must fetch them before dispatching the next
    segment — the engine loop is sequential by construction.
    """
    S, T_gen = state.seqs.shape
    positions = jnp.arange(T_gen)

    def body(st: SlotState, key):
        active = st.occupied & ~st.done
        last = jnp.take_along_axis(st.seqs, (st.t - 1)[:, None], axis=1)[:, 0]
        logits, cache = model.apply(
            {"params": params}, last, st.cache, st.t,
            method=StyleVAE.decode_step_ragged,
        )
        filtered = _filter_logits(logits / temperature, top_k, top_p)
        if greedy:
            nxt = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(key, filtered).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        scores = st.scores + jnp.where(active, -tok_logp, 0.0)
        write = active[:, None] & (positions[None, :] == st.t[:, None])
        seqs = jnp.where(write, nxt[:, None], st.seqs)
        done = st.done | (
            active & ((nxt == EOS_ID) | (st.t + 1 >= st.budget))
        )
        t = jnp.where(active, st.t + 1, st.t)
        return SlotState(cache, seqs, scores, t, st.budget, done,
                         st.occupied), None

    keys = jax.random.split(rng, segment_steps)
    state, _ = jax.lax.scan(body, state, keys)
    return state, state.seqs, state.t, state.done, state.scores


@dataclasses.dataclass
class _Unit:
    """One (request, target-class) generation lane."""

    request: "_Request"
    target_class: int


@dataclasses.dataclass
class _Request:
    tokens: np.ndarray
    callback: Callable
    t0: float
    results_tokens: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict
    )
    pending_units: int = 0


class StreamingTransferEngine:
    """Continuous-batching style-transfer engine (see module docstring).

    Programmatic use::

        eng = StreamingTransferEngine(model_folder, checkpoint=-1)
        eng.start()
        eng.enqueue(midi_bytes, callback)   # callback(TransferResult)
        ...
        eng.stop()

    ``submit_midi`` is the blocking single-request convenience path.
    Construction mirrors ``StyleTransferService`` so the serve CLI can pick
    either engine behind the same flags.
    """

    def __init__(
        self,
        model_folder: str,
        checkpoint: Optional[int] = -1,
        *,
        slots: int = 32,
        max_seq_len: int = 64,
        segment_steps: int = 16,
        admit_size: int = 8,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 0.0,
        greedy: bool = False,
        seed: int = 0,
    ):
        self.model, self.params = load_inference_model(
            model_folder, checkpoint, max_seq_len
        )
        dc = self.model.config.decoder_config
        if getattr(dc, "decoder_type", "transformer") == "lstm":
            raise ValueError(
                "streaming engine requires the transformer decoder "
                "(per-slot ragged KV positions); use StyleTransferService "
                "for the LSTM decoder"
            )
        self.num_classes = dc.num_classes
        self.slots = int(slots)
        self.max_seq_len = int(max_seq_len)
        self.segment_steps = int(segment_steps)
        self.admit_size = int(admit_size)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.greedy = bool(greedy)
        if self.slots < self.num_classes or self.admit_size < self.num_classes:
            raise ValueError(
                f"slots ({self.slots}) and admit_size ({self.admit_size}) "
                f"must each cover one request's {self.num_classes} "
                f"per-class units"
            )
        # Budget/positions mirror decode_sampled: seqs rows hold up to
        # 2*(L+1) positions (SOS + generated), the cache one extra for the
        # conditioning state at position 0.
        self.t_gen = 2 * (self.max_seq_len + 1)
        self.t_cache = self.t_gen + 1
        self._rng = jax.random.key(seed)
        self._writer = MelodyWriter()
        self._queue: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.stats = ServiceStats()
        self._device = jax.config.jax_default_device
        self._unit_by_slot: Dict[int, _Unit] = {}
        self._free_slots: List[int] = list(range(self.slots))
        self._state: Optional[SlotState] = None

    # -- request preparation (same semantics as the batch service) -------

    def _tokens_from_midi(self, midi_bytes: bytes) -> np.ndarray:
        mf = smf.parse_midifile(midi_bytes)
        for track in mf.tracks:
            toks = tokenize_track(track)
            if len(toks):
                return toks[: self.max_seq_len]
        raise ValueError("no note events in MIDI request")

    # -- public API -------------------------------------------------------

    def enqueue(self, midi_bytes: bytes, callback: Callable) -> None:
        """Queue a request; ``callback(TransferResult)`` fires when every
        target class has been generated. On a failed admission/segment the
        callback receives the Exception (same contract as the service)."""
        self._queue.put(
            (self._tokens_from_midi(midi_bytes), callback, time.perf_counter())
        )

    def submit_midi(self, midi_bytes: bytes) -> TransferResult:
        """Blocking single-request convenience path (engine must be
        running, or this call drives the loop inline when it is not)."""
        box: List = []
        ev = threading.Event()

        def cb(result):
            box.append(result)
            ev.set()

        self.enqueue(midi_bytes, cb)
        if not self.is_serving():
            self._drive_until(ev)
        ev.wait(timeout=300)
        if not box:
            raise TimeoutError("streaming transfer did not complete")
        if isinstance(box[0], Exception):
            raise box[0]
        return box[0]

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def is_serving(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    # -- engine cycle ------------------------------------------------------

    def _ensure_state(self) -> None:
        if self._state is None:
            self._state = _init_state(
                self.model, self.params, slots=self.slots, t_gen=self.t_gen,
                t_cache=self.t_cache,
            )

    def _collect_arrivals(self, block: bool) -> List[Tuple]:
        """Pop queued requests that fit the free slots / admit width."""
        arrivals: List[Tuple] = []
        budget_slots = len(self._free_slots)
        budget_units = self.admit_size
        while (budget_slots >= self.num_classes
               and budget_units >= self.num_classes):
            try:
                item = self._queue.get(
                    timeout=0.05 if (block and not arrivals) else 0.0
                )
            except queue.Empty:
                break
            arrivals.append(item)
            budget_slots -= self.num_classes
            budget_units -= self.num_classes
            block = False
        return arrivals

    def _admit_arrivals(self, arrivals: List[Tuple]) -> None:
        A = self.admit_size
        L = self.max_seq_len
        tokens = np.full((A, L + 1), PAD_ID, np.int32)
        tokens[:, 0] = SOS_ID
        seq_lens = np.ones((A,), np.int32)
        classes = np.zeros((A,), np.int32)
        budgets = np.zeros((A,), np.int32)
        slot_sel = np.zeros((A, self.slots), np.float32)
        row = 0
        for toks, callback, t0 in arrivals:
            req = _Request(tokens=toks, callback=callback, t0=t0,
                           pending_units=self.num_classes)
            m = min(len(toks), L)
            for c in range(self.num_classes):
                slot = self._free_slots.pop()
                self._unit_by_slot[slot] = _Unit(req, c)
                tokens[row, 1 : m + 1] = toks[:m]
                seq_lens[row] = m + 1
                classes[row] = c
                # 2x the input length (reference sampler.py:164), bounded
                # by the row size; counts positions incl. the SOS slot.
                budgets[row] = min(2 * (m + 1), self.t_gen)
                slot_sel[row, slot] = 1.0
                row += 1
        self._state = _admit(
            self.model, self.params, self._state,
            jnp.asarray(tokens), jnp.asarray(seq_lens), jnp.asarray(classes),
            jnp.asarray(slot_sel), jnp.asarray(budgets),
        )

    def _run_segment(self):
        self._rng, key = jax.random.split(self._rng)
        out = _segment(
            self.model, self.params, self._state, key,
            jnp.asarray(self.temperature, jnp.float32),
            segment_steps=self.segment_steps,
            top_k=self.top_k, top_p=self.top_p, greedy=self.greedy,
        )
        self._state = out[0]
        return out[1:]  # (seqs, t, done, scores) device copies

    def _harvest(self, seqs, done) -> None:
        """Release finished slots; fire callbacks for finished requests."""
        done = np.asarray(done)
        finished = [s for s, u in list(self._unit_by_slot.items()) if done[s]]
        if not finished:
            self.stats.record_batch(
                fill=len(self._unit_by_slot),
                queue_depth_after=self._queue.qsize(), latencies_ms=[],
                served=0,
            )
            return
        seqs = np.asarray(seqs)
        now = time.perf_counter()
        latencies: List[float] = []
        for s in finished:
            unit = self._unit_by_slot.pop(s)
            self._free_slots.append(s)
            unit.request.results_tokens[unit.target_class] = seqs[s]
            unit.request.pending_units -= 1
            if unit.request.pending_units == 0:
                req = unit.request
                latencies.append((now - req.t0) * 1e3)
                try:
                    req.callback(self._result_of(req))
                except Exception:
                    import logging

                    self.stats.record_error()
                    logging.getLogger(__name__).exception(
                        "streaming result callback raised"
                    )
        self.stats.record_batch(
            fill=len(self._unit_by_slot) + len(finished),
            queue_depth_after=self._queue.qsize(), latencies_ms=latencies,
            served=len(latencies),
        )

    def _result_of(self, req: _Request) -> TransferResult:
        midi_by_class, tokens_by_class = {}, {}
        for c, row in req.results_tokens.items():
            melody = melody_from_ids(row)
            tokens_by_class[c] = melody.tokens
            midi_by_class[c] = smf.dump_midifile(
                self._writer.to_midifile(melody)
            )
        return TransferResult(midi_by_class, tokens_by_class)

    def _cycle(self, block: bool) -> bool:
        """One engine cycle: admit, advance one segment, harvest.
        Returns True when any work happened. Blocks briefly for arrivals
        only when NO slot is in flight — live slots must keep advancing."""
        self._ensure_state()
        arrivals = self._collect_arrivals(
            block=block and not self._unit_by_slot
        )
        if arrivals:
            self._admit_arrivals(arrivals)
        if not self._unit_by_slot:
            return bool(arrivals)
        seqs, t, done, scores = self._run_segment()
        self._harvest(seqs, done)
        return True

    def _fail_all(self, exc: Exception) -> None:
        """Admission/segment failure: fail every in-flight and queued
        request fast (service contract), reset the engine state. Each
        request's callback fires ONCE even when several of its per-class
        units are in flight."""
        failed = {id(u.request): u.request for u in self._unit_by_slot.values()}
        for req in failed.values():
            req.pending_units = -1  # mark failed
            try:
                req.callback(exc)
            except Exception:
                pass
        self._unit_by_slot.clear()
        self._free_slots = list(range(self.slots))
        self._state = None
        while True:
            try:
                _, callback, _ = self._queue.get_nowait()
            except queue.Empty:
                break
            try:
                callback(exc)
            except Exception:
                pass

    def _drive_until(self, ev: threading.Event) -> None:
        """Inline driver for the blocking path when no loop thread runs."""
        while not ev.is_set():
            try:
                worked = self._cycle(block=True)
            except Exception as exc:
                self._fail_all(exc)  # sets ev via the request's callback
                return
            if not worked:
                time.sleep(0.001)

    def _loop(self) -> None:
        import logging

        while self._running:
            try:
                if self._device is not None:
                    with jax.default_device(self._device):
                        worked = self._cycle(block=True)
                else:
                    worked = self._cycle(block=True)
                if not worked:
                    continue
            except Exception as exc:
                self.stats.record_error()
                logging.getLogger(__name__).exception(
                    "streaming cycle failed; engine state reset"
                )
                self._fail_all(exc)

"""Live cross-instance shared xbit state — the xbit-redis analog.

The reference's Redis mode (src/xbit-redis.c, src/redis.c; config
etc/sagan.yaml:180-186) exists so MULTIPLE concurrently-running sagan
processes observe each other's xbits: ``xbit: set`` issues a Redis SET,
``xbit: isset`` a GET, so whichever instance wrote last wins and a bit
set by instance A gates rules evaluated by instance B. This module is
the Ray-native equivalent for concurrent ``run_engine``/``follow``
instances inside one Ray cluster: a tiny NAMED DETACHED actor holds the
global ``(conv_id, xbit name, track key) → expire_epoch`` map.

Semantics (deliberately mirroring the Redis backend, not the mmap one):

- The store is AUTHORITATIVE for xbits while shared mode is on: at each
  bucket replay the engine replaces the xbits of every conversation
  present in that bucket's input with the store's current view, replays,
  then publishes the per-conversation delta (one ``apply`` per bucket).
  ``unset`` is an entry with expire 0 — identical to the evaluator's
  in-state representation (oracle/evaluator.py::_xbit_set,
  reference xbit-mmap.c:168), so absence and expire-0 mean the same
  thing and publishing never needs a delete op.
- Ops apply in ARRIVAL order at the actor — exactly Redis SET ordering.
  Two instances racing on one bit resolve by whichever bucket task's
  ``apply`` lands last, as two sagan processes racing on a Redis key do.
- Visibility granularity is the replay batch, not the single event: a
  bit published by instance A is seen by instance B at B's next bucket
  fetch. This is the honest batch analog of per-event Redis GETs — the
  reference's mode is itself racy at event granularity (no transaction
  spans check+set), so batch-boundary visibility is a coarsening, not a
  semantic change. Within one run, same-conversation events still see
  each other's bits immediately (they replay in one bucket task).
- Scope is xbits only, as in the reference: after/threshold/flexbit
  state stays per-instance (mmap analog = state_dir snapshots). With
  both ``shared_bits`` and ``state_dir`` set, the store's xbit view
  overrides the snapshot's for conversations present in the run; the
  snapshot remains the durable fallback when shared mode is off.

Scale: the store holds only ACTIVE flags (few bytes each), the same
assumption the reference makes of its Redis instance; ``fetch`` ships
the whole map to each bucket task per run — fine for flag cardinality,
and ``prune(watermark)`` (the Clean_IPC_Object analog) keeps it tight.
The actor is ``num_cpus=0`` (it only serves dict ops) and ``detached``
so independently-launched driver processes in the same Ray cluster all
resolve the same name — the deployment shape of a shared Redis.
"""

from __future__ import annotations

DEFAULT_NAMESPACE = "sagan_ray"


class _SharedBitStore:
    """Actor body. Keys are (conv_id, name, track_key); values are
    expire epochs (0 = unset marker, semantically equal to absence)."""

    def __init__(self):
        self._bits: dict[tuple[str, str, str], int] = {}

    def apply(self, ops) -> int:
        """Apply [(conv_id, name, track_key, expire), ...] in order
        (Redis SET semantics: last write wins). Returns the live-entry
        count so callers can observe growth."""
        for conv, name, key, expire in ops:
            self._bits[(conv, name, key)] = int(expire)
        return len(self._bits)

    def fetch(self) -> list:
        """Current global view as [(conv_id, name, track_key, expire)]."""
        return [(c, n, k, e) for (c, n, k), e in self._bits.items()]

    def prune(self, watermark: int) -> int:
        """Drop entries that can no longer gate anything at or after
        ``watermark`` (expire ≤ watermark; unset markers always qualify)
        — the lazy Clean_IPC_Object sweep (reference src/ipc.c:78).
        Returns the number of entries dropped."""
        dead = [k for k, e in self._bits.items() if e <= watermark]
        for k in dead:
            del self._bits[k]
        return len(dead)

    def clear(self) -> None:
        self._bits.clear()


def shared_bit_store(name: str = "shared_bits",
                     namespace: str = DEFAULT_NAMESPACE):
    """Get-or-create the named detached store actor and return its
    handle. Safe under creation races (both sides resolve to the one
    registered actor, like two sagan instances pointing at one Redis)."""
    import ray

    try:
        return ray.get_actor(name, namespace=namespace)
    except ValueError:
        pass
    actor_cls = ray.remote(num_cpus=0)(_SharedBitStore)
    try:
        return actor_cls.options(
            name=name, namespace=namespace, lifetime="detached",
            get_if_exists=True).remote()
    except ValueError:
        return ray.get_actor(name, namespace=namespace)


def merge_shared_bits(init_states: dict, convs, snapshot: list) -> dict:
    """Replace the xbits of every conversation in ``convs`` with the
    store ``snapshot``'s view (store-authoritative, see module doc).
    Mutates ``init_states`` in place (creating _ConvState entries as
    needed) and returns the pre-replay view
    ``{(conv, name, key): expire}`` for delta computation."""
    from ..oracle.evaluator import _ConvState

    convs = set(convs)
    for conv in convs:
        st = init_states.get(conv)
        if st is not None:
            st.xbits = {}
    pre: dict[tuple[str, str, str], int] = {}
    for conv, name, key, expire in snapshot:
        if conv not in convs:
            continue
        st = init_states.get(conv)
        if st is None:
            st = _ConvState()
            init_states[conv] = st
        st.xbits[(name, key)] = expire
        pre[(conv, name, key)] = expire
    return pre


def bit_delta_ops(pre: dict, out_states: dict, convs) -> list:
    """Ops for every (conv, name, key) whose post-replay expire differs
    from the pre-replay store view — the publish half of a bucket."""
    ops = []
    for conv in set(convs):
        st = out_states.get(conv)
        if st is None:
            continue
        for (name, key), expire in st.xbits.items():
            if pre.get((conv, name, key)) != expire:
                ops.append((conv, name, key, int(expire)))
    return ops

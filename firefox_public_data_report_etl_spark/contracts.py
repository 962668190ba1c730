"""Single source of truth for the testdata-generator data contract.

The driver-generated synthetic tables (TESTDATA.md, seed=42) carry
implicit invariants that several plans depend on: the `events` table's
closed event-type domain and the `embeddings` table's vector
dimension.  The data-quality audit (plans/quality.py) asserts these as
constraints; the pivot plans (plans/hardware.py) enumerate the domain
to keep the pivot single-pass; the embedding operators size buffers by
the dimension.  Before this module each consumer re-declared the
constants locally, so a generator change could silently flip the audit
to a false violation while the pivots kept "working" on a stale
domain.  Import from HERE — never re-declare.

At production scale the same constants would come from a schema
registry / table property; this module is that registry's in-repo
stand-in.
"""

from __future__ import annotations

# `events.event_type` closed domain (generator emits exactly these).
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")

# `embeddings.embedding` is array<float> of exactly this many entries.
EMBEDDING_DIM: int = 64

"""DynamoDB-protocol state store over the wire — the reference's
coordination plane executed against a real network endpoint.

The reference keeps ALL distributed-consumer state in one DynamoDB
table (statestore.go:21-45): a shard-list cache per app+stream, a
client registry with heartbeat timestamps (leader = first id in
ascending sort order, syncclient.go:86), and per-(stream, shard)
checkpoint sequence numbers. Its live test environment is localstack
Kinesis + DynamoDB (reference tests/docker-compose.yml). The Kinesis
half of that environment already executes here over the wire
(kinesis_wire.py); this module supplies the DynamoDB half:

- ``FakeDynamoServer`` — a localhost HTTP endpoint implementing the
  PUBLIC DynamoDB JSON protocol (X-Amz-Target
  ``DynamoDB_20120810.<Op>``, ``application/x-amz-json-1.0`` bodies,
  typed attribute values) for the operation subset a kinesumer-style
  state store uses: DescribeTable, GetItem, PutItem, UpdateItem,
  DeleteItem, Query (table + LSI), BatchGetItem, BatchWriteItem.
- ``DynamoStateStore`` — the reference's StateStore interface
  (statestore.go:23-33) re-expressed over a genuine boto3 DynamoDB
  client: same single-table key scheme (statemodel.go:10-14 —
  ``shard_cache#<app>`` / ``client#<app>`` /
  ``check_point#<app>#<stream>``), same query shapes (consistent
  GetItem for the shard cache, ascending client Query filtered on
  last_update, LSI-ranged prune Query, BatchGet/BatchWrite for
  checkpoints).

Everything here is the public AWS API surface; no proprietary
behavior. Against real DynamoDB the store changes one constructor
argument (the endpoint), exactly like the reference's
``DynamoDBEndpoint`` config (statestore.go:51-53).

Scale: the state store carries COORDINATION rows — O(#clients +
#shards) items, never data-plane volume. At 1000 executors and a
1000-shard stream the table holds ~2k tiny items and the chattiest
call (heartbeat ping) is one UpdateItem per client per interval; the
100 TB of record payload never touches this path.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = [
    "FakeDynamoServer",
    "DynamoStateStore",
    "dynamo_client",
    "OUTDATED_GAP",
]

# The reference's staleness horizon for client heartbeats
# (syncleader.go:12: outdatedGap = 10 * time.Second).
OUTDATED_GAP = 10.0
# Real-service request caps (DynamoDB API reference): exceeding either is a
# ValidationException against AWS, so the client must chunk.
MAX_BATCH_WRITE = 25  # write requests per BatchWriteItem
MAX_BATCH_GET = 100  # keys per BatchGetItem


# ---------------------------------------------------------------------------
# Typed-attribute helpers (public DynamoDB JSON value encoding)
# ---------------------------------------------------------------------------


def _cmp_key(av: dict):
    """Sort/compare key for a typed attribute value: numbers compare
    numerically, strings lexicographically — DynamoDB range-key
    semantics for N and S."""
    if "N" in av:
        return float(av["N"])
    if "S" in av:
        return av["S"]
    raise _DynError(
        "ValidationException", f"unsupported key type {sorted(av)}"
    )


_OPS = {
    "=": lambda a, b: a == b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


class _DynError(Exception):
    def __init__(self, type_: str, message: str) -> None:
        super().__init__(message)
        self.type = type_
        self.message = message


# one condition: `name op :val` — after #-alias substitution
_COND_RE = re.compile(r"^\s*([\w.#]+)\s*(=|<=|>=|<|>)\s*(:[\w]+)\s*$")


def _parse_conditions(expr: str, names: dict, values: dict) -> list[tuple]:
    """Parse `a = :x AND b > :y` into [(attr, op, typed_value), ...].
    Covers the key/filter expression shapes a kinesumer-style store
    issues; anything fancier raises ValidationException like the real
    service would for malformed input."""
    out = []
    for part in re.split(r"\s+AND\s+", expr, flags=re.IGNORECASE):
        m = _COND_RE.match(part)
        if not m:
            raise _DynError(
                "ValidationException", f"unsupported expression: {part!r}"
            )
        attr, op, ref = m.groups()
        attr = names.get(attr, attr)
        if ref not in values:
            raise _DynError(
                "ValidationException", f"missing value {ref}"
            )
        out.append((attr, op, values[ref]))
    return out


# ---------------------------------------------------------------------------
# The table: single pk/sk schema + local secondary indexes
# ---------------------------------------------------------------------------


class _Table:
    """One DynamoDB table: items keyed (pk, sk), plus LSIs declared as
    {index_name: range_attr} — the reference's table has exactly one,
    ``index-client-key-last-update`` on (pk, last_update)
    (statestore.go:195)."""

    def __init__(
        self, name: str, lsis: dict[str, str] | None = None
    ) -> None:
        self.name = name
        self.lsis = lsis or {}
        self.items: dict[tuple, dict] = {}  # (pk_key, sk_key) -> item
        self.lock = threading.Lock()

    @staticmethod
    def _key_of(item_or_key: dict) -> tuple:
        pk = item_or_key["pk"]
        sk = item_or_key["sk"]
        return (_cmp_key(pk), _cmp_key(sk))

    def describe(self) -> dict:
        return {
            "Table": {
                "TableName": self.name,
                "TableStatus": "ACTIVE",
                "KeySchema": [
                    {"AttributeName": "pk", "KeyType": "HASH"},
                    {"AttributeName": "sk", "KeyType": "RANGE"},
                ],
                "LocalSecondaryIndexes": [
                    {
                        "IndexName": idx,
                        "KeySchema": [
                            {"AttributeName": "pk", "KeyType": "HASH"},
                            {"AttributeName": rng, "KeyType": "RANGE"},
                        ],
                    }
                    for idx, rng in self.lsis.items()
                ],
                "ItemCount": len(self.items),
            }
        }


class _DynamoApi:
    """Dispatch table for the DynamoDB JSON protocol subset."""

    def __init__(self, tables: dict[str, _Table]) -> None:
        self.tables = tables
        # API-level lock for API-WIDE counters (_bw_requests/_bg_keys):
        # per-table locks don't serialize concurrent batch calls across
        # tables under ThreadingHTTPServer (r10 advisory)
        self.lock = threading.Lock()
        # every Nth BatchWriteItem REQUEST (counted across calls) is
        # returned in UnprocessedItems instead of applied (0 = off) —
        # the DynamoDB partial-failure contract under throttling: the
        # CALL succeeds, botocore does NOT resubmit, the caller must.
        # (The reference's guregu/dynamo Batch().Write() resubmits
        # internally; statestore.go:260-281 relies on that.)
        self.unprocessed_every = 0
        self._bw_requests = 0
        # same partial-return contract for reads: every Nth BatchGetItem
        # KEY (counted across calls) comes back in UnprocessedKeys
        # instead of Responses (0 = off) — real DynamoDB does this under
        # size/throughput pressure and botocore does not re-fetch
        self.unprocessed_get_every = 0
        self._bg_keys = 0

    def _table(self, body: dict, key: str = "TableName") -> _Table:
        name = body[key]
        t = self.tables.get(name)
        if t is None:
            raise _DynError(
                "ResourceNotFoundException", f"Table not found: {name}"
            )
        return t

    def dispatch(self, op: str, body: dict) -> dict:
        fn = getattr(self, f"op_{op}", None)
        if fn is None:
            raise _DynError("UnknownOperationException", op)
        return fn(body)

    def op_DescribeTable(self, body: dict) -> dict:
        return self._table(body).describe()

    def op_PutItem(self, body: dict) -> dict:
        t = self._table(body)
        item = body["Item"]
        with t.lock:
            t.items[t._key_of(item)] = dict(item)
        return {}

    def op_GetItem(self, body: dict) -> dict:
        t = self._table(body)
        with t.lock:
            item = t.items.get(t._key_of(body["Key"]))
        # ConsistentRead accepted (single-node store is trivially
        # consistent); absent item -> no "Item" key, like the service
        return {"Item": dict(item)} if item is not None else {}

    def op_DeleteItem(self, body: dict) -> dict:
        t = self._table(body)
        with t.lock:
            t.items.pop(t._key_of(body["Key"]), None)
        return {}

    def op_UpdateItem(self, body: dict) -> dict:
        """SET-only UpdateExpression — the two shapes the state store
        issues: ``SET shards = :v`` (statestore.go:99-103) and
        ``SET last_update = :t`` (statestore.go:174-178). Upserts
        like the real service: a missing item is created from the key."""
        t = self._table(body)
        expr = body.get("UpdateExpression", "")
        if not expr.strip().upper().startswith("SET "):
            raise _DynError(
                "ValidationException", f"unsupported update: {expr!r}"
            )
        names = body.get("ExpressionAttributeNames", {})
        values = body.get("ExpressionAttributeValues", {})
        with t.lock:
            key = t._key_of(body["Key"])
            item = t.items.setdefault(key, dict(body["Key"]))
            for assign in expr.strip()[4:].split(","):
                attr, _, ref = assign.partition("=")
                attr = names.get(attr.strip(), attr.strip())
                ref = ref.strip()
                if ref not in values:
                    raise _DynError(
                        "ValidationException", f"missing value {ref}"
                    )
                item[attr] = values[ref]
        return {}

    def op_Query(self, body: dict) -> dict:
        t = self._table(body)
        names = body.get("ExpressionAttributeNames", {})
        values = body.get("ExpressionAttributeValues", {})
        conds = _parse_conditions(
            body["KeyConditionExpression"], names, values
        )
        # range attribute: sk on the base table, the LSI's declared
        # range key when IndexName is present (statestore.go:192-196)
        range_attr = "sk"
        if "IndexName" in body:
            idx = body["IndexName"]
            if idx not in t.lsis:
                raise _DynError(
                    "ResourceNotFoundException", f"Index not found: {idx}"
                )
            range_attr = t.lsis[idx]
        pk_val = None
        range_conds = []
        for attr, op, val in conds:
            if attr == "pk":
                if op != "=":
                    raise _DynError(
                        "ValidationException", "pk condition must be ="
                    )
                pk_val = val
            elif attr == range_attr:
                range_conds.append((op, val))
            else:
                raise _DynError(
                    "ValidationException",
                    f"{attr} is not a key attribute of this query target",
                )
        if pk_val is None:
            raise _DynError(
                "ValidationException", "query requires a pk condition"
            )
        filters = (
            _parse_conditions(body["FilterExpression"], names, values)
            if body.get("FilterExpression")
            else []
        )
        with t.lock:
            rows = [dict(i) for i in t.items.values()]
        hits = []
        for item in rows:
            if _cmp_key(item["pk"]) != _cmp_key(pk_val):
                continue
            if range_attr not in item:
                continue  # sparse index: items without the attr absent
            if not all(
                _OPS[op](_cmp_key(item[range_attr]), _cmp_key(val))
                for op, val in range_conds
            ):
                continue
            hits.append(item)
        # index order BEFORE filtering: FilterExpression applies after
        # the key-ranged read, per the public Query contract
        hits.sort(
            key=lambda i: _cmp_key(i[range_attr]),
            reverse=not body.get("ScanIndexForward", True),
        )
        hits = [
            i
            for i in hits
            if all(
                attr in i and _OPS[op](_cmp_key(i[attr]), _cmp_key(val))
                for attr, op, val in filters
            )
        ]
        return {"Items": hits, "Count": len(hits)}

    def op_BatchGetItem(self, body: dict) -> dict:
        # real-service cap: >100 keys in one call is rejected outright
        if sum(len(r["Keys"]) for r in body["RequestItems"].values()) > MAX_BATCH_GET:
            raise _DynError(
                "ValidationException",
                f"Too many items requested for the BatchGetItem call "
                f"(max {MAX_BATCH_GET})",
            )
        responses: dict[str, list] = {}
        unprocessed_keys: dict[str, dict] = {}
        for name, req in body["RequestItems"].items():
            t = self._table({"TableName": name})
            got = []
            with t.lock:
                for key in req["Keys"]:
                    # API-wide counter: guard with the API-level lock —
                    # ThreadingHTTPServer can interleave BatchGetItem
                    # calls across tables, and t.lock is per-table
                    with self.lock:
                        self._bg_keys += 1
                        drop = (
                            self.unprocessed_get_every
                            and self._bg_keys % self.unprocessed_get_every
                            == 0
                        )
                    if drop:
                        unprocessed_keys.setdefault(name, {"Keys": []})[
                            "Keys"
                        ].append(key)
                        continue
                    item = t.items.get(t._key_of(key))
                    if item is not None:
                        got.append(dict(item))
            responses[name] = got
        return {"Responses": responses, "UnprocessedKeys": unprocessed_keys}

    def op_BatchWriteItem(self, body: dict) -> dict:
        # real-service cap: >25 write requests in one call is rejected
        if sum(len(r) for r in body["RequestItems"].values()) > MAX_BATCH_WRITE:
            raise _DynError(
                "ValidationException",
                f"Too many items requested for the BatchWriteItem call "
                f"(max {MAX_BATCH_WRITE})",
            )
        unprocessed: dict[str, list] = {}
        for name, reqs in body["RequestItems"].items():
            t = self._table({"TableName": name})
            with t.lock:
                for req in reqs:
                    # same API-wide-counter discipline as BatchGetItem
                    with self.lock:
                        self._bw_requests += 1
                        drop = (
                            self.unprocessed_every
                            and self._bw_requests % self.unprocessed_every
                            == 0
                        )
                    if drop:
                        unprocessed.setdefault(name, []).append(req)
                        continue
                    if "PutRequest" in req:
                        item = req["PutRequest"]["Item"]
                        t.items[t._key_of(item)] = dict(item)
                    elif "DeleteRequest" in req:
                        t.items.pop(
                            t._key_of(req["DeleteRequest"]["Key"]), None
                        )
                    else:
                        raise _DynError(
                            "ValidationException", "unknown write request"
                        )
        return {"UnprocessedItems": unprocessed}


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self) -> None:  # noqa: N802 - http.server contract
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length) or b"{}")
        op = self.headers.get("X-Amz-Target", "").split(".")[-1]
        try:
            doc = self.server.api.dispatch(op, body)  # type: ignore[attr-defined]
            code = 200
        except _DynError as e:
            doc = {"__type": e.type, "message": e.message}
            code = 400
        data = json.dumps(doc).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.0")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args) -> None:  # silence per-request stderr
        pass


class FakeDynamoServer:
    """Localhost DynamoDB wire endpoint. Creates the kinesumer-shaped
    table (pk/sk + the last_update LSI) unless given explicit tables."""

    def __init__(
        self,
        tables: dict[str, _Table] | None = None,
        *,
        table: str = "kinesumer-state",
    ) -> None:
        if tables is None:
            tables = {
                table: _Table(
                    table,
                    lsis={"index-client-key-last-update": "last_update"},
                )
            }
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.api = _DynamoApi(tables)  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def api(self) -> _DynamoApi:
        return self._httpd.api  # type: ignore[attr-defined]

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> "FakeDynamoServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def dynamo_client(endpoint: str):
    """Real boto3 DynamoDB client pointed at the localhost endpoint —
    botocore does signing, serialization, and retries, same as the
    Kinesis wire path (kinesis_wire.wire_client)."""
    import boto3
    from botocore.config import Config

    return boto3.client(
        "dynamodb",
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        endpoint_url=endpoint,
        config=Config(
            retries={"mode": "standard", "max_attempts": 8},
            connect_timeout=5,
            read_timeout=10,
        ),
    )


# ---------------------------------------------------------------------------
# The state store: statestore.go over boto3
# ---------------------------------------------------------------------------


def _n(x: float) -> dict:
    return {"N": repr(float(x))}


def _s(x: str) -> dict:
    return {"S": x}


class DynamoStateStore:
    """The reference's StateStore (statestore.go:23-33) over the wire.

    Single-table key scheme (statemodel.go:10-14):

    - shard cache: pk=``shard_cache#<app>``, sk=stream, attr shards
    - clients:     pk=``client#<app>``,     sk=client_id, last_update
    - checkpoints: pk=``check_point#<app>#<stream>``, sk=shard_id,
      sequence_number, last_update

    ``clock`` is injected (defaults to time.time) so staleness
    (OUTDATED_GAP) is deterministic under test — the reference's
    time.Now() sites (statestore.go:114,139,189)."""

    def __init__(
        self,
        endpoint: str,
        app: str,
        *,
        table: str = "kinesumer-state",
        clock=time.time,
    ) -> None:
        self.app = app
        self.table = table
        self.clock = clock
        self.client = dynamo_client(endpoint)
        # the reference's reachability ping: DescribeTable at
        # construction (statestore.go:61-63)
        self.client.describe_table(TableName=table)

    # -- key builders (statemodel.go:24-26, 35-37, 55-57) ---------------
    def _shard_cache_key(self) -> str:
        return f"shard_cache#{self.app}"

    def _client_key(self) -> str:
        return f"client#{self.app}"

    def _check_point_key(self, stream: str) -> str:
        return f"check_point#{self.app}#{stream}"

    # -- shard cache (statestore.go:74-108) -----------------------------
    def get_shards(self, stream: str) -> list[dict] | None:
        out = self.client.get_item(
            TableName=self.table,
            Key={"pk": _s(self._shard_cache_key()), "sk": _s(stream)},
            ConsistentRead=True,
        )
        if "Item" not in out:
            return None  # ErrNoShardCache (statestore.go:86-88)
        return [
            {
                "shard_id": m["M"]["shard_id"]["S"],
                "closed": m["M"]["closed"]["BOOL"],
            }
            for m in out["Item"]["shards"]["L"]
        ]

    def update_shards(self, stream: str, shards: list[dict]) -> None:
        self.client.update_item(
            TableName=self.table,
            Key={"pk": _s(self._shard_cache_key()), "sk": _s(stream)},
            UpdateExpression="SET shards = :s",
            ExpressionAttributeValues={
                ":s": {
                    "L": [
                        {
                            "M": {
                                "shard_id": _s(sh["shard_id"]),
                                "closed": {"BOOL": bool(sh["closed"])},
                            }
                        }
                        for sh in shards
                    ]
                }
            },
        )

    # -- client registry (statestore.go:111-183) ------------------------
    def list_all_alive_client_ids(self) -> list[str]:
        """Ascending sk order with a last_update staleness filter —
        the sort IS the leader-election order (syncclient.go:86,
        statestore.go:117-122)."""
        now = self.clock()
        out = self.client.query(
            TableName=self.table,
            KeyConditionExpression="pk = :pk AND sk > :floor",
            FilterExpression="last_update > :cut",
            ExpressionAttributeValues={
                ":pk": _s(self._client_key()),
                ":floor": _s(" "),
                ":cut": _n(now - OUTDATED_GAP),
            },
            ScanIndexForward=True,
        )
        return [i["sk"]["S"] for i in out["Items"]]

    def register_client(self, client_id: str) -> None:
        self.client.put_item(
            TableName=self.table,
            Item={
                "pk": _s(self._client_key()),
                "sk": _s(client_id),
                "last_update": _n(self.clock()),
            },
        )

    def deregister_client(self, client_id: str) -> None:
        self.client.delete_item(
            TableName=self.table,
            Key={"pk": _s(self._client_key()), "sk": _s(client_id)},
        )

    def ping_client_aliveness(self, client_id: str) -> None:
        self.client.update_item(
            TableName=self.table,
            Key={"pk": _s(self._client_key()), "sk": _s(client_id)},
            UpdateExpression="SET last_update = :t",
            ExpressionAttributeValues={":t": _n(self.clock())},
        )

    def prune_clients(self) -> list[str]:
        """LSI-ranged stale scan + batched delete (statestore.go:186-221).
        Returns pruned ids (the reference returns only error; the ids
        make the behavior assertable)."""
        now = self.clock()
        out = self.client.query(
            TableName=self.table,
            IndexName="index-client-key-last-update",
            KeyConditionExpression="pk = :pk AND last_update < :cut",
            ExpressionAttributeValues={
                ":pk": _s(self._client_key()),
                ":cut": _n(now - OUTDATED_GAP),
            },
        )
        stale = out["Items"]
        if not stale:
            return []
        self._batch_write(
            {
                self.table: [
                    {
                        "DeleteRequest": {
                            "Key": {"pk": i["pk"], "sk": i["sk"]}
                        }
                    }
                    for i in stale
                ]
            }
        )
        return [i["sk"]["S"] for i in stale]

    def _batch_write(self, request_items: dict) -> None:
        """BatchWriteItem with the two loops the real DynamoDB contract
        requires. (a) Chunking: BatchWriteItem rejects >25 write
        requests per call outright (ValidationException), so a
        wide-stream checkpoint commit — one PutRequest per shard — must
        be split; guregu/dynamo's Batch().Write() chunks to 25
        internally for the reference (statestore.go:260-281), boto3
        does not. (b) UnprocessedItems resubmission: under throttling
        the call SUCCEEDS with the unapplied subset in
        UnprocessedItems, and botocore does not resubmit it — silently
        dropping it would lose committed checkpoints and replay records
        on the next restart. Both loops bounded so a persistently-
        throttled table raises instead of spinning."""
        import time

        for table, requests in request_items.items():
            for i in range(0, len(requests), MAX_BATCH_WRITE):
                pending = {table: requests[i : i + MAX_BATCH_WRITE]}
                for attempt in range(10):
                    out = self.client.batch_write_item(RequestItems=pending)
                    pending = out.get("UnprocessedItems") or {}
                    if not pending:
                        break
                    if attempt < 9:
                        time.sleep(0.01 * (2**attempt))
                else:
                    raise RuntimeError(
                        f"{sum(len(v) for v in pending.values())} write "
                        "requests still unprocessed after 10 "
                        "BatchWriteItem attempts"
                    )

    # -- checkpoints (statestore.go:224-281) ----------------------------
    def list_check_points(
        self, stream: str, shard_ids: list[str]
    ) -> dict[str, str]:
        """BatchGetItem caps at 100 keys per call and may return ANY
        subset of the rest in UnprocessedKeys (size pressure, not just
        throttling) — a dropped key here is a checkpoint the restart
        path never sees, so that shard restarts from TRIM_HORIZON and
        replays records. Chunk to 100 and loop UnprocessedKeys the same
        bounded way _batch_write loops UnprocessedItems (guregu/dynamo
        does both internally for the reference, statestore.go:224-257)."""
        if not shard_ids:
            raise ValueError("empty shard ids given")  # ErrEmptyShardIDs
        import time

        found: dict[str, str] = {}
        keys = [
            {"pk": _s(self._check_point_key(stream)), "sk": _s(sid)}
            for sid in shard_ids
        ]
        for i in range(0, len(keys), MAX_BATCH_GET):
            pending = {self.table: {"Keys": keys[i : i + MAX_BATCH_GET]}}
            for attempt in range(10):
                out = self.client.batch_get_item(RequestItems=pending)
                for item in out["Responses"].get(self.table, []):
                    found[item["sk"]["S"]] = item["sequence_number"]["S"]
                pending = out.get("UnprocessedKeys") or {}
                if not pending:
                    break
                if attempt < 9:
                    time.sleep(0.01 * (2**attempt))
            else:
                raise RuntimeError(
                    f"{sum(len(v['Keys']) for v in pending.values())} "
                    "keys still unprocessed after 10 BatchGetItem attempts"
                )
        return found

    def update_check_points(self, checkpoints: list[dict]) -> None:
        """checkpoints: [{stream, shard_id, sequence_number}] — the
        reference's ShardCheckPoint batch-put (statestore.go:260-281),
        with the UnprocessedItems resubmission the contract requires
        (see _batch_write)."""
        self._batch_write(
            {
                self.table: [
                    {
                        "PutRequest": {
                            "Item": {
                                "pk": _s(
                                    self._check_point_key(cp["stream"])
                                ),
                                "sk": _s(cp["shard_id"]),
                                "sequence_number": _s(
                                    cp["sequence_number"]
                                ),
                                "last_update": _n(self.clock()),
                            }
                        }
                    }
                    for cp in checkpoints
                ]
            }
        )

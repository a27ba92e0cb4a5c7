"""Auth/session layer (SURVEY §3.3) — driver-side glue, not a distributed op.

Replicates the behavioral surface of the reference's auth family
(B/web/api/auth.py): signup (dup-email check, two-table insert), login
(verify password, rotate session token, touch last_login), logout (clear
token), and current-user resolution from a session token — all over the
``users``/``clients`` snapshot tables. Password hashing uses pbkdf2-sha256
from the stdlib (bcrypt isn't in this image; the reference uses bcrypt —
same contract: salted, one-way, verify-only).

These are point lookups and single-row updates; running them as Spark jobs
would be absurd at any scale, so rows are read through the table layer but
mutations rewrite only the (tiny) users/clients partitions. Tenant scoping
for the *data* path (P3) stays an engine concept — `current_client_id` is
what the query/ingest layers take as their ``client_id`` argument.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import secrets
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .schemas import CLIENTS_SCHEMA, USERS_SCHEMA
from .tables.snapshot import SnapshotTable

_PBKDF2_ITERS = 100_000


def hash_password(password: str) -> str:
    salt = secrets.token_hex(16)
    digest = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), salt.encode(), _PBKDF2_ITERS
    ).hex()
    return f"pbkdf2_sha256${_PBKDF2_ITERS}${salt}${digest}"


def verify_password(password: str, stored: str) -> bool:
    try:
        algo, iters, salt, digest = stored.split("$")
    except ValueError:
        return False
    if algo != "pbkdf2_sha256":
        return False
    got = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), salt.encode(), int(iters)
    ).hex()
    return secrets.compare_digest(got, digest)


def _now() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None, microsecond=0)


@dataclass
class AuthError(Exception):
    message: str


class AuthService:
    """users + clients tables keyed like the reference's models."""

    def __init__(self, users: SnapshotTable, clients: SnapshotTable):
        assert users.schema == USERS_SCHEMA
        assert clients.schema == CLIENTS_SCHEMA
        self.users = users
        self.clients = clients

    # -- signup (B/web/api/auth.py:97-129) ---------------------------------
    def signup(
        self,
        spark: SparkSession,
        company_name: str,
        email: str,
        full_name: str,
        password: str,
        address: str | None = None,
    ) -> dict:
        users = self.users.read(spark)
        if users.filter(F.col("email") == email).limit(1).count():
            raise AuthError("Email already registered")
        clients = self.clients.read(spark)
        cid = int(self.clients.current_manifest().props.get("max_id", 0)) + 1
        uid = int(self.users.current_manifest().props.get("max_id", 0)) + 1
        now = _now()
        client_row = spark.createDataFrame(
            [(cid, company_name, now, address, True)], schema=CLIENTS_SCHEMA
        )
        user_row = spark.createDataFrame(
            [
                (
                    uid,
                    cid,
                    email,
                    full_name,
                    now,
                    hash_password(password),
                    True,
                    None,
                    None,
                )
            ],
            schema=USERS_SCHEMA,
        )
        self.clients.overwrite_all(
            clients.unionByName(client_row)
        )
        self.users.overwrite_all(users.unionByName(user_row))
        return {"user_id": uid, "client_id": cid}

    # -- login (B/web/api/auth.py:33-69) -----------------------------------
    def login(self, spark: SparkSession, email: str, password: str) -> str:
        users = self.users.read(spark)
        row = (
            users.filter((F.col("email") == email) & F.col("active"))
            .limit(1)
            .collect()
        )
        if not row or not verify_password(password, row[0]["password_hash"]):
            raise AuthError("Invalid credentials")
        token = secrets.token_urlsafe(32)
        updated = users.withColumn(
            "session_token",
            F.when(F.col("email") == email, F.lit(token)).otherwise(
                F.col("session_token")
            ),
        ).withColumn(
            "last_login",
            F.when(
                F.col("email") == email, F.lit(_now()).cast("timestamp_ntz")
            ).otherwise(F.col("last_login")),
        )
        self.users.overwrite_all(updated)
        return token

    # -- logout (B/web/api/auth.py:77-94) ----------------------------------
    def logout(self, spark: SparkSession, token: str) -> None:
        users = self.users.read(spark)
        updated = users.withColumn(
            "session_token",
            F.when(F.col("session_token") == token, F.lit(None)).otherwise(
                F.col("session_token")
            ),
        )
        self.users.overwrite_all(updated)

    # -- current user from token (B/web/dependencies.py:15-47) -------------
    def current_user(self, spark: SparkSession, token: str) -> dict:
        if not token:
            raise AuthError("Not authenticated")
        row = (
            self.users.read(spark)
            .filter((F.col("session_token") == token) & F.col("active"))
            .limit(1)
            .collect()
        )
        if not row:
            raise AuthError("Not authenticated")
        u = row[0].asDict()
        client = (
            self.clients.read(spark)
            .filter((F.col("id") == u["client_id"]) & F.col("active"))
            .limit(1)
            .collect()
        )
        if not client:
            raise AuthError("Client inactive")
        return {
            "user_id": u["id"],
            "email": u["email"],
            "full_name": u["full_name"],
            "client_id": u["client_id"],
            "company_name": client[0]["company_name"],
        }

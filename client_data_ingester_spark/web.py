"""HTTP facade — the reference's three route families over the Spark engine.

Replicates the behavioral surface of B/web (B/ = mply_ingester/backend/
mply_ingester/): ``POST /auth/signup|login|logout`` (B/web/api/auth.py:33-129),
``GET /products/list`` + ``POST /products/ingest`` (B/web/api/products.py:34-97)
and the cookie-session dependency chain (B/web/dependencies.py:15-47) — as a
dependency-free WSGI app (FastAPI/uvicorn aren't in this image; WSGI is the
stdlib-portable equivalent and runs under any WSGI server).

Contract parity (each has a ported test in tests/test_web_api.py):
- signup: form fields with the reference's min-length constraints → 422 on
  validation failure (FastAPI's code), 400 "Email already registered" on dup,
  200 {email, full_name, company_name};
- login: OAuth2-style form (username, password) → 401 "Invalid email or
  password", 200 {email, full_name} + httponly session_token cookie
  (lax, 7-day);
- logout: auth required; clears the token server-side and expires the cookie;
- list: cookie auth; q/s/l query params (s ≥ 0, 1 ≤ l ≤ 50 default 5 —
  B/web/api/products.py:38-39) → JSON array of ClientProductOut rows;
- ingest: multipart form (parser_config json + data_file upload + optional
  full_update) → IngestionReport JSON; 400 on invalid parser_config.

The routes delegate to the engine layers (AuthService, list_products,
ingest_data) — the HTTP layer holds no business logic, mirroring the
reference's thin-controller shape.
"""

from __future__ import annotations

import json
from email.parser import BytesParser
from email.policy import HTTP as _HTTP_POLICY
from http.cookies import SimpleCookie
from urllib.parse import parse_qs

from pyspark.sql import SparkSession

from .auth import AuthError, AuthService
from .ingestion.mapping import ParserConfig
from .ingestion.service import ingest_data
from .queries.products import list_products
from .tables.snapshot import SnapshotTable


class _HttpError(Exception):
    def __init__(self, status: int, detail: str):
        self.status = status
        self.detail = detail


_STATUS_LINE = {
    200: "200 OK",
    400: "400 Bad Request",
    401: "401 Unauthorized",
    404: "404 Not Found",
    405: "405 Method Not Allowed",
    422: "422 Unprocessable Entity",
    500: "500 Internal Server Error",
}


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    """Multipart/form-data → {field name: raw bytes} via the email parser
    (the cgi module is deprecated; multipart bodies ARE MIME)."""
    msg = BytesParser(policy=_HTTP_POLICY).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    fields: dict[str, bytes] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            fields[name] = part.get_payload(decode=True) or b""
    return fields


def _product_out(row: dict) -> dict:
    """ClientProductOut rendering (B/web/api/products.py:17-32): prices as
    floats, timestamps ISO, None passthrough."""
    out = dict(row)
    for k in ("max_price", "min_price", "reference_price"):
        if out.get(k) is not None:
            out[k] = float(out[k])
    if out.get("last_changed_on") is not None:
        out["last_changed_on"] = out["last_changed_on"].isoformat()
    return out


class SparkIngesterApp:
    """WSGI app wiring the engine to the reference's route table
    (B/web/app.py:7-25 mounts auth at /auth and products at /products)."""

    def __init__(
        self,
        spark: SparkSession,
        products_table: SnapshotTable,
        users_table: SnapshotTable,
        clients_table: SnapshotTable,
    ):
        self.spark = spark
        self.products = products_table
        self.auth = AuthService(users_table, clients_table)

    # -- WSGI entry ---------------------------------------------------------

    def __call__(self, environ, start_response):
        try:
            status, payload, extra_headers = self._dispatch(environ)
        except _HttpError as e:
            status, payload, extra_headers = e.status, {"detail": e.detail}, []
        except AuthError as e:
            status, payload, extra_headers = 401, {"detail": e.message}, []
        except Exception:  # pragma: no cover - parity catch-all
            # log server-side, return the reference's generic body — never
            # leak internal paths/plan details to the client
            import logging
            import traceback

            logging.getLogger(__name__).error(
                "unhandled error serving %s %s\n%s",
                environ.get("REQUEST_METHOD"),
                environ.get("PATH_INFO"),
                traceback.format_exc(),
            )
            status, payload, extra_headers = (
                500,
                {"detail": "Internal Server Error"},
                [],
            )
        body = json.dumps(payload).encode()
        start_response(
            _STATUS_LINE[status],
            [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(body))),
                *extra_headers,
            ],
        )
        return [body]

    def _dispatch(self, environ):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/")
        routes = {
            ("POST", "/auth/signup"): self._signup,
            ("POST", "/auth/login"): self._login,
            ("POST", "/auth/logout"): self._logout,
            ("GET", "/products/list"): self._list,
            ("POST", "/products/ingest"): self._ingest,
        }
        handler = routes.get((method, path))
        if handler is None:
            if any(p == path for _, p in routes):
                raise _HttpError(405, "Method Not Allowed")
            raise _HttpError(404, "Not Found")
        return handler(environ)

    # -- request plumbing ---------------------------------------------------

    def _body(self, environ) -> bytes:
        length = int(environ.get("CONTENT_LENGTH") or 0)
        return environ["wsgi.input"].read(length) if length else b""

    def _form(self, environ) -> dict[str, str]:
        return {
            k: v[0]
            for k, v in parse_qs(self._body(environ).decode()).items()
        }

    def _cookie_token(self, environ) -> str | None:
        jar = SimpleCookie(environ.get("HTTP_COOKIE", ""))
        morsel = jar.get("session_token")
        return morsel.value if morsel else None

    def _require_user(self, environ) -> dict:
        """Cookie → user dict; the reference's get_current_user chain
        (B/web/dependencies.py:15-37): 401 on absent or unknown token."""
        token = self._cookie_token(environ)
        if not token:
            raise _HttpError(401, "Not authenticated")
        try:
            return self.auth.current_user(self.spark, token)
        except AuthError:
            raise _HttpError(401, "Invalid authentication token") from None

    # -- /auth (B/web/api/auth.py) ------------------------------------------

    def _signup(self, environ):
        form = self._form(environ)
        full_name = form.get("full_name", "")
        email = form.get("email", "").strip()
        password = form.get("password", "")
        company_name = form.get("company_name", "")
        company_address = form.get("company_address", "")
        # the reference's Form(...) constraints (B/web/api/auth.py:99-103);
        # FastAPI rejects these with 422 before the handler runs
        if not 3 <= len(full_name) <= 50:
            raise _HttpError(422, "full_name must be 3-50 characters")
        if "@" not in email or "." not in email.split("@")[-1]:
            raise _HttpError(422, "invalid email address")
        if len(password) < 8:
            raise _HttpError(422, "password must be at least 8 characters")
        if len(company_name) < 5:
            raise _HttpError(422, "company_name must be at least 5 characters")
        if len(company_address) < 8:
            raise _HttpError(422, "company_address must be at least 8 characters")
        try:
            self.auth.signup(
                self.spark,
                company_name=company_name,
                email=email,
                full_name=full_name,
                password=password,
                address=company_address,
            )
        except AuthError:
            raise _HttpError(400, "Email already registered") from None
        return (
            200,
            {
                "email": email,
                "full_name": full_name,
                "company_name": company_name,
            },
            [],
        )

    def _login(self, environ):
        form = self._form(environ)
        try:
            token = self.auth.login(
                self.spark,
                form.get("username", "").strip(),
                form.get("password", ""),
            )
        except AuthError:
            raise _HttpError(401, "Invalid email or password") from None
        user = self.auth.current_user(self.spark, token)
        cookie = (
            f"session_token={token}; HttpOnly; SameSite=lax; "
            f"Max-Age={7 * 24 * 3600}; Path=/"
        )
        return (
            200,
            {"email": user["email"], "full_name": user["full_name"]},
            [("Set-Cookie", cookie)],
        )

    def _logout(self, environ):
        self._require_user(environ)
        self.auth.logout(self.spark, self._cookie_token(environ))
        expired = "session_token=; HttpOnly; SameSite=lax; Max-Age=0; Path=/"
        return (
            200,
            {"message": "Successfully logged out"},
            [("Set-Cookie", expired)],
        )

    # -- /products (B/web/api/products.py) ----------------------------------

    def _list(self, environ):
        user = self._require_user(environ)
        params = {
            k: v[0] for k, v in parse_qs(environ.get("QUERY_STRING", "")).items()
        }
        try:
            offset = int(params.get("s", 0))
            limit = int(params.get("l", 5))
        except ValueError:
            raise _HttpError(422, "s and l must be integers") from None
        q = params.get("q") or None
        try:
            df = list_products(
                self.products.read(self.spark, user["client_id"]),
                user["client_id"],
                q=q,
                offset=offset,
                limit=limit,
            )
        except ValueError as e:  # the Query(ge/le) constraints
            raise _HttpError(422, str(e)) from None
        return 200, [_product_out(r.asDict()) for r in df.collect()], []

    def _ingest(self, environ):
        user = self._require_user(environ)
        content_type = environ.get("CONTENT_TYPE", "")
        if "multipart/form-data" not in content_type:
            raise _HttpError(422, "multipart/form-data required")
        fields = _parse_multipart(self._body(environ), content_type)
        if "parser_config" not in fields or "data_file" not in fields:
            raise _HttpError(422, "parser_config and data_file are required")
        try:
            config = ParserConfig.from_json(fields["parser_config"])
            config.validate_targets()
        except Exception as e:
            raise _HttpError(400, f"Invalid parser_config: {e}") from None
        full_update = fields.get("full_update", b"").decode().lower() in (
            "true",
            "1",
        )
        report = ingest_data(
            self.spark,
            self.products,
            fields["data_file"],
            config,
            client_id=user["client_id"],
            full_update=full_update,
        )
        return (
            200,
            {
                "success": report.success,
                "message": report.message,
                "processed_items": report.processed_items,
                "report": report.report,
                "stats": report.stats,
            },
            [],
        )


def serve(app: SparkIngesterApp, host: str = "127.0.0.1", port: int = 8000):
    """Run under the stdlib WSGI server (dev convenience; any WSGI server
    works — the reference runs uvicorn, B/web/app.py:30-39)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, app) as httpd:
        httpd.serve_forever()

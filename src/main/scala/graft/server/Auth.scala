package graft.server

/** Pluggable authentication for the serving tiers, mirroring the
  * reference's auth middleware chain (server/protocols/native/
  * middleware/auth.go:16-30 AuthProvider interface,
  * simple_auth_provider.go). The native protocol checks hello
  * user/password, pg-wire runs a cleartext-password startup exchange
  * (auth code 3), HTTP checks a bearer token — unauthenticated
  * requests get the reference's error flow, never a hang. */
trait AuthProvider {
  def authenticate(user: String, password: String, database: String): Boolean
  /** Bearer tokens for the HTTP tier (auth.go ValidateToken). */
  def validateToken(token: String): Boolean
}

/** Static user map — the reference's SimpleAuthProvider with its
  * default development users (simple_auth_provider.go:44-76). */
final class SimpleAuthProvider(
    users: Map[String, String] = SimpleAuthProvider.DefaultUsers,
    tokens: Set[String] = Set.empty) extends AuthProvider {
  def authenticate(user: String, password: String, database: String): Boolean =
    users.get(user).contains(password)
  def validateToken(token: String): Boolean = tokens.contains(token)
}

object SimpleAuthProvider {
  /** default/"" (empty password), admin, readonly — the reference's
    * addDefaultUsers set. */
  val DefaultUsers: Map[String, String] = Map(
    "default" -> "",
    "admin" -> "admin123",
    "readonly" -> "readonly123")
}

package graft.server

import com.sun.net.httpserver.HttpExchange

/** Request authentication (reference `cubes/server/auth.py:18-90` +
  * wiring `blueprint.py:112-125,160-170`): an authenticator extracts the
  * request identity BEFORE routing; failure is a 401 carrying the HTTP
  * Basic challenge. Configured via `[server] authentication:` with
  * options from the `[authentication]` section. `none` (the reference
  * default) keeps the built-in permissive flows (`?identity`/`?api_key`/
  * `Authorization: Bearer`). */
final class NotAuthenticated(val realm: String)
    extends RuntimeException("not authenticated")

trait Authenticator {
  /** Identity of the request, or throw [[NotAuthenticated]]. A permissive
    * authenticator returns None for an anonymous request. */
  def authenticate(ex: HttpExchange, q: Map[String, String]): Option[String]
  /** `WWW-Authenticate` challenge value for 401 responses, when the
    * scheme has one. */
  def challenge: Option[String] = None
}

/** Shared HTTP Basic plumbing (reference `AbstractBasicAuthenticator`,
  * `auth.py:29-42`): the realm'd challenge + credential parsing. */
abstract class AbstractBasicAuthenticator(realm: String) extends Authenticator {
  override def challenge: Option[String] = Some(s"""Basic realm="$realm"""")
  /** (username, password) from the `Authorization: Basic` header. */
  protected def credentials(ex: HttpExchange): Option[(String, String)] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.regionMatches(true, 0, "Basic ", 0, 6))
      .flatMap { h =>
        try {
          val decoded = new String(
            java.util.Base64.getDecoder.decode(h.substring(6).trim),
            java.nio.charset.StandardCharsets.UTF_8)
          decoded.split(":", 2) match {
            case Array(u, p) => Some((u, p))
            case _           => Some((decoded, ""))
          }
        } catch { case _: IllegalArgumentException => None }
      }
  protected def deny(): Nothing = throw new NotAuthenticated(realm)
}

/** Test/demo HTTP Basic: username must equal password, username becomes
  * the identity (reference `AdminAdminAuthenticator`, `auth.py:44-57`). */
final class AdminAdminAuthenticator(realm: String = "Default")
    extends AbstractBasicAuthenticator(realm) {
  override def authenticate(ex: HttpExchange,
      q: Map[String, String]): Option[String] =
    credentials(ex) match {
      case Some((u, p)) if u == p => Some(u)
      case _                      => deny()
    }
}

/** Proxy-trusting HTTP Basic: the proxy already authenticated the user,
  * so any presented username is the identity — no password check
  * (reference `HTTPBasicProxyAuthenticator`, `auth.py:72-90`). */
final class HTTPBasicProxyAuthenticator(realm: String = "Default")
    extends AbstractBasicAuthenticator(realm) {
  override def authenticate(ex: HttpExchange,
      q: Map[String, String]): Option[String] =
    credentials(ex) match {
      case Some((u, _)) => Some(u)
      case None         => deny()
    }
}

/** Permissive URL-parameter identity (reference
  * `PassParameterAuthenticator`, `auth.py:60-69`). */
final class PassParameterAuthenticator(parameter: String = "api_key")
    extends Authenticator {
  override def authenticate(ex: HttpExchange,
      q: Map[String, String]): Option[String] = q.get(parameter)
}

object Authenticators {
  /** Authenticator from the parsed config: `[server] authentication:`
    * selects the method, the `[authentication]` section provides options
    * (`realm`, `parameter`) — reference `blueprint.py:112-125`. */
  def configured(
      cfg: Map[String, Map[String, String]]): Option[Authenticator] = {
    val opts = cfg.getOrElse("authentication", Map.empty)
    cfg.getOrElse("server", Map.empty).get("authentication") match {
      case None | Some("none") => None
      case Some("admin_admin") =>
        Some(new AdminAdminAuthenticator(opts.getOrElse("realm", "Default")))
      case Some("http_basic_proxy") =>
        Some(new HTTPBasicProxyAuthenticator(opts.getOrElse("realm", "Default")))
      case Some("pass_parameter") =>
        Some(new PassParameterAuthenticator(opts.getOrElse("parameter", "api_key")))
      case Some(m) => throw new IllegalArgumentException(
        s"unknown authentication method '$m'")
    }
  }
}

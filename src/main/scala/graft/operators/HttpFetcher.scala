package graft.operators

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** S7's real fetcher: per-key HTTP GET, the live implementation of the
  * fetch function `Enrich` injects — the reference's Drupal image-hash
  * lookup (mongo-etl/sha256_pipeline.py:30-41: GET per hash, basic
  * auth) re-expressed for `Enrich.enrichWith`'s per-task-connection
  * contract.
  *
  * Semantics mapped onto Enrich's negative cache:
  *  - 2xx      → Some(body)  — a hit;
  *  - 404      → None        — a genuine miss, cached as (value=null,
  *               fetch_ok=true) so it is never re-fetched;
  *  - other / IO error → exception — Enrich records (value=null,
  *               fetch_ok=false) so callers can retry selectively.
  *
  * Uses only the JDK client (no extra deps); keep-alive pooling is the
  * JDK's own, so the "connection per task" is the pooled socket each
  * task's fetch loop reuses. The reference also disables TLS
  * verification (`verify=False`) — deliberately NOT reproduced; give
  * the JVM a truststore instead of turning the check off. */
object HttpFetcher {

  /** An `Enrich.enrichWith`/`lookupTableWith` init: builds the
    * per-task fetch function. `urlFor` maps a key to its GET URL. */
  def forEnrich(urlFor: String => String,
    basicAuth: Option[(String, String)] = None,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000): () => String => Option[String] = () => {
    // per-task setup: encode the auth header once for the whole slice
    val auth = basicAuth.map { case (u, p) =>
      "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes(StandardCharsets.UTF_8))
    }
    (key: String) => {
      val conn = new URL(urlFor(key)).openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      auth.foreach(conn.setRequestProperty("Authorization", _))
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) {
        val in = conn.getInputStream
        try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
        finally in.close()
      } else {
        // drain + close so the keep-alive socket returns to the pool
        Option(conn.getErrorStream).foreach { es =>
          try es.readAllBytes() finally es.close()
        }
        if (code == 404) None
        else throw new java.io.IOException(s"HTTP $code for key '$key'")
      }
    }
  }
}

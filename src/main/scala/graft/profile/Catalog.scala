package graft.profile

import graft.reports.Editorial

/** Catalog envelope builder (SURVEY.md §1.1 "Catalog envelope" and §2.3
  * J10 config-enrichment join; reference: catalog/build.py:63-101 copy
  * generated_at/last_release from the manifest, :170-200 dataset cards,
  * :145-157 whitespace collapse + word-boundary truncation): join
  * configured card entries with published manifest metadata. */
object Catalog {

  case class CardConfig(id: String, title: JVal, description: JVal,
                        manifestPath: String, tags: Seq[String])

  case class Card(id: String, title: String, description: String,
                  manifestPath: String, tags: Seq[String],
                  generatedAt: Option[String], generationStatus: Option[String],
                  itemCount: Option[Int])

  /** Enrichment join: each configured card looks up its manifest (left
    * join — cards without a published manifest keep null metadata). */
  def build(configs: Seq[CardConfig],
            manifests: Map[String, ManifestEnvelope],
            locale: String = "pt", descriptionMax: Int = 160): Seq[Card] =
    configs.map { cfg =>
      val m = manifests.get(cfg.manifestPath)
      Card(
        id = cfg.id,
        title = Editorial.localized(cfg.title, locale).getOrElse(cfg.id),
        description = Editorial.localized(cfg.description, locale)
          .map(d => Editorial.truncateAtWord(Editorial.collapseWhitespace(d), descriptionMax))
          .getOrElse(""),
        manifestPath = cfg.manifestPath,
        tags = cfg.tags,
        generatedAt = m.map(_.generatedAt),
        generationStatus = m.map(_.generationStatus),
        itemCount = m.map(_.items.length))
    }

  def toJson(cards: Seq[Card], generatedAt: String): String =
    JVal.render(JObj(Seq(
      "schema_version" -> JStr("2.0"),
      "generated_at" -> JStr(generatedAt),
      "cards" -> JArr(cards.map(c => JObj(Seq(
        "id" -> JStr(c.id),
        "title" -> JStr(c.title),
        "description" -> JStr(c.description),
        "manifest_path" -> JStr(c.manifestPath),
        "tags" -> JArr(c.tags.map(JStr)),
        "generated_at" -> c.generatedAt.fold[JVal](JNull)(JStr),
        "generation_status" -> c.generationStatus.fold[JVal](JNull)(JStr),
        "item_count" -> c.itemCount.fold[JVal](JNull)(n => JNum(n.toDouble)))))))))
}

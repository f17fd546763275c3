package graft.feed

import org.scalatest.funsuite.AnyFunSuite

/** Ported from `test/e2e/markdown-parsing.test.ts` + frontmatter/list cases
  * from `src/parsers/markdown.ts` semantics; plus robots.txt matcher cases
  * from `src/fetchers/robots.ts` semantics. */
class MarkdownSpec extends AnyFunSuite {

  test("extracts sections, links, and code blocks") {
    val markdown =
      """
# My Document

Check out [Example](https://example.com) for more info.

## Section One

- [Link 1](https://one.com) - First link
- [Link 2](https://two.com) - Second link

## Section Two

More content with [another link](https://three.com).

```bash
npm install scrapex
```
"""
    val result = MarkdownParser.parse(markdown)
    assert(result.sections.length == 3)
    assert(result.sections(0).title == "My Document")
    assert(result.links.length == 4)
    assert(result.codeBlocks.length == 1)
    assert(result.codeBlocks(0).language.contains("bash"))
    assert(result.codeBlocks(0).code == "npm install scrapex")
    assert(result.title.contains("My Document"))
  }

  test("filters links by domain (guide example)") {
    val markdown =
      """
# Links

- [GitHub](https://github.com/user/repo)
- [npm](https://www.npmjs.com/package/scrapex)
- [Docs](https://example.com/docs)
"""
    val result = MarkdownParser.parse(markdown)
    assert(result.links.count(l => graft.urlx.UrlOps.extractDomain(l.url) == "github.com") == 1)
    assert(result.links.count(l => graft.urlx.UrlOps.extractDomain(l.url) == "npmjs.com") == 1)
  }

  test("frontmatter coercion and title/description precedence") {
    val md =
      """---
title: "FM Title"
count: 42
flag: true
description: FM desc
---

# Heading Title

Body paragraph.
"""
    val r = MarkdownParser.parse(md)
    assert(r.frontmatter("title") == "FM Title")
    assert(r.frontmatter("count") == "42")
    assert(r.frontmatter("flag") == "true")
    assert(r.title.contains("FM Title"))
    assert(r.description.contains("FM desc"))
  }

  test("description = first paragraph before any heading") {
    val r = MarkdownParser.parse("Intro paragraph here.\n\n# Head\n\nBody.")
    assert(r.description.contains("Intro paragraph here."))
  }

  test("section content accumulates paragraphs; links get section context") {
    val r = MarkdownParser.parse("# S1\n\nPara one.\n\nPara two with [L](https://x.com).\n")
    assert(r.sections.head.content == "Para one.\n\nPara two with L.")
    assert(r.links.head.context.contains("S1"))
  }

  test("extractListLinks with heading context; groupByCategory") {
    val md = "# Cat A\n\n- [One](https://one.com)\n\n# Cat B\n\n- [Two](https://two.com)\n\nNot a [list link](https://three.com).\n"
    val links = MarkdownParser.extractListLinks(md)
    assert(links.map(_.url) == Vector("https://one.com", "https://two.com"))
    assert(links(0).context.contains("Cat A"))
    assert(links(1).context.contains("Cat B"))
    val grouped = MarkdownParser.groupByCategory(links :+ MarkdownLink("https://u.com", "u", None, None))
    assert(grouped("Cat A").length == 1)
    assert(grouped("Uncategorized").length == 1)
  }

  test("parseByHeadings filters by min level") {
    val md = "# Top\n\n## Sub A\n\ntext\n\n### Sub B\n\ntext\n"
    val secs = MarkdownParser.parseByHeadings(md, 2)
    assert(secs.map(_.title) == Seq("Sub A", "Sub B"))
  }

  test("github url utils") {
    import GitHubOps._
    assert(isGitHubRepo("https://github.com/user/repo"))
    assert(isGitHubRepo("https://github.com/user/repo/"))
    assert(!isGitHubRepo("https://github.com/user/repo/issues"))
    assert(parseGitHubUrl("https://github.com/user/repo.git").contains(("user", "repo")))
    assert(toRawUrl("https://github.com/user/repo") == "https://raw.githubusercontent.com/user/repo/main/README.md")
    assert(toRawUrl("not-github") == "not-github")
  }

  test("robots: agent groups, allow precedence, wildcards, fail-open") {
    import graft.sources.Robots._
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public$
        |
        |User-agent: scrapexbot
        |Disallow: /bot-only/
        |""".stripMargin
    // wildcard group for an unknown agent
    val rules = parseRobotsTxt(txt, "OtherBot/2.0")
    assert(!isPathAllowed(rules, "/private/page"))
    assert(isPathAllowed(rules, "/public/page"))
    assert(isPathAllowed(rules, "/private/public"))
    // specific group overrides wildcard
    val botRules = parseRobotsTxt(txt, "ScrapexBot/1.0")
    assert(!isPathAllowed(botRules, "/bot-only/x"))
    assert(isPathAllowed(botRules, "/private/page")) // wildcard rules replaced
    // wildcards
    assert(matchesPattern("/a/b/c", "/a/*"))
    assert(matchesPattern("/x/file.pdf", "/x/*.pdf$") == false) // $ anchor exact
    assert(matchesPattern("/exact", "/exact$"))
    assert(!matchesPattern("/exact/sub", "/exact$"))
    // fail-open
    assert(isAllowed(null, "https://example.com/x"))
    assert(isAllowed("", "https://example.com/x"))
    assert(!isAllowed("User-agent: *\nDisallow: /x", "https://example.com/x/page"))
  }
}

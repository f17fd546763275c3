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

  // ---- remaining reference assertions ported verbatim ----

  test("canParse detection cases (markdown.test.ts:7-26)") {
    assert(MarkdownParser.canParse("# Heading"))
    assert(MarkdownParser.canParse("## Subheading"))
    assert(MarkdownParser.canParse("- [Link](https://example.com)"))
    assert(MarkdownParser.canParse("* [Link](https://example.com)"))
    assert(MarkdownParser.canParse("```js\nconsole.log(\"hi\");\n```"))
    assert(!MarkdownParser.canParse("Just plain text without markdown"))
  }

  test("link title captured (markdown.test.ts:97-101)") {
    val r = MarkdownParser.parse("[Link](https://example.com \"Link Title\")")
    assert(r.links.head.title.contains("Link Title"))
  }

  test("code block meta and missing language (markdown.test.ts:137-148)") {
    val withMeta = MarkdownParser.parse("```ts title=\"example.ts\"\nconst x = 1;\n```")
    assert(withMeta.codeBlocks.head.language.contains("ts"))
    assert(withMeta.codeBlocks.head.meta.contains("title=\"example.ts\""))
    val noLang = MarkdownParser.parse("```\nplain code\n```")
    assert(noLang.codeBlocks.head.language.isEmpty)
    val js = MarkdownParser.parse("# Code Example\n\n```javascript\nconsole.log('Hello');\n```\n")
    assert(js.codeBlocks.length == 1)
    assert(js.codeBlocks.head.language.contains("javascript"))
    assert(js.codeBlocks.head.code == "console.log('Hello');")
  }

  test("frontmatter quoted strings and numerics (markdown.test.ts:151-177)") {
    val nums = MarkdownParser.parse("---\ncount: 42\nprice: 19.99\n---\n")
    assert(nums.frontmatter.get("count").contains("42"))
    assert(nums.frontmatter.get("price").contains("19.99"))
    val quoted = MarkdownParser.parse("---\nsingle: 'quoted'\ndouble: \"quoted\"\n---\n")
    assert(quoted.frontmatter.get("single").contains("quoted"))
    assert(quoted.frontmatter.get("double").contains("quoted"))
  }

  test("extractListLinks: nested lists find all unique urls (markdown.test.ts:197-210)") {
    val md = "\n## Category\n\n- [Parent](https://parent.com)\n  - [Child One](https://child1.com)\n  - [Child Two](https://child2.com)\n"
    val urls = MarkdownParser.extractListLinks(md).map(_.url).toSet
    assert(urls.contains("https://parent.com"))
    assert(urls.contains("https://child1.com"))
    assert(urls.contains("https://child2.com"))
  }
}

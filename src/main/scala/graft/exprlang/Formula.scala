package graft.exprlang

import scala.util.parsing.combinator.RegexParsers

/** AST for the reference's formula DSL (seafan parser.go:146-268).
  * Precedence, loosest to tightest: `&&`/`||` -> comparisons -> `+`/`-`
  * -> `*`/`/` -> `^` (parser.go:39-55), unary minus, function calls,
  * float literals, '...'-quoted string/date constants.
  */
sealed trait Expr
object Expr {
  case class Num(v: Double) extends Expr
  case class Quoted(s: String) extends Expr
  case class Ident(name: String) extends Expr
  case class Neg(e: Expr) extends Expr
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Call(fn: String, args: List[Expr]) extends Expr
}

/** Recursive-descent parser for the formula grammar. Pure front-end:
  * parse once, compile to a Catalyst Column tree with [[Compiler]]
  * (where seafan re-evaluates the whole tree eagerly per call,
  * parser.go:1589-1629, we hand one declarative expression to Catalyst
  * and the optimizer folds/pipelines it).
  */
object Parser extends RegexParsers {
  import Expr._

  override def skipWhitespace = true

  private def num: Parser[Expr] =
    """\d+\.?\d*([eE][-+]?\d+)?|\.\d+""".r ^^ (s => Num(s.toDouble))
  private def quoted: Parser[Expr] =
    "'" ~> """[^']*""".r <~ "'" ^^ Quoted.apply
  private def ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r

  private def call: Parser[Expr] =
    ident ~ ("(" ~> repsep(orExpr, ",") <~ ")") ^^ {
      case f ~ args => Call(f, args)
    }

  private def atom: Parser[Expr] =
    call | num | quoted | (ident ^^ Ident.apply) | ("(" ~> orExpr <~ ")")

  private def unary: Parser[Expr] =
    ("-" ~> unary ^^ Neg.apply) | ("+" ~> unary) | atom

  private def power: Parser[Expr] =
    unary ~ rep("^" ~> unary) ^^ { case h ~ t =>
      // right-associative exponent
      val all = h :: t
      all.reduceRight((a, b) => Bin("^", a, b))
    }

  private def term: Parser[Expr] =
    power ~ rep(("*" | "/") ~ power) ^^ { case h ~ t =>
      t.foldLeft(h) { case (acc, op ~ e) => Bin(op, acc, e) }
    }

  private def arith: Parser[Expr] =
    term ~ rep(("+" | "-") ~ term) ^^ { case h ~ t =>
      t.foldLeft(h) { case (acc, op ~ e) => Bin(op, acc, e) }
    }

  private def cmp: Parser[Expr] =
    arith ~ rep(("==" | "!=" | ">=" | "<=" | ">" | "<") ~ arith) ^^ {
      case h ~ t => t.foldLeft(h) { case (acc, op ~ e) => Bin(op, acc, e) }
    }

  private def orExpr: Parser[Expr] =
    cmp ~ rep(("&&" | "||") ~ cmp) ^^ { case h ~ t =>
      t.foldLeft(h) { case (acc, op ~ e) => Bin(op, acc, e) }
    }

  def parse(formula: String): Expr = parseAll(orExpr, formula) match {
    case Success(e, _) => e
    case f: NoSuccess => throw new IllegalArgumentException(
      s"formula parse error in '$formula': ${f.msg}")
  }
}

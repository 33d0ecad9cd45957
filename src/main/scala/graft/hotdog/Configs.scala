package graft.hotdog

/** Rule-config fixtures, hotdog-YAML shape. Semantics copied from the
  * reference's own configs (cited per block); these drive the flagship
  * pipeline, the tests, and the bench. */
object Configs {

  /** The reference's example config rules (hotdog.yml:26-68): hello-regex →
    * replace+forward(test)+stop; meta.topic jmespath → merge+forward
    * dynamic `{{value}}`+stop; `.*` catch-all → forward(logs-unknown)+stop. */
  val hotdogYml: String =
    """rules:
      |  - regex: '^hello\s+(?P<name>\w+)?'
      |    field: msg
      |    actions:
      |      - type: replace
      |        template: |
      |          This is the total message: {{msg}}
      |
      |          And the name is: {{name}}
      |
      |      - type: forward
      |        topic: test
      |
      |      - type: stop
      |
      |  - jmespath: 'meta.topic'
      |    field: msg
      |    actions:
      |      - type: merge
      |        json:
      |          meta:
      |            hotdog:
      |              version: '{{version}}'
      |              timestamp: '{{iso8601}}'
      |
      |      - type: forward
      |        topic: '{{value}}'
      |
      |      - type: stop
      |
      |  - regex: '.*'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'logs-unknown'
      |
      |      - type: stop
      |""".stripMargin

  /** test/configs/single-rule-with-merge.yml */
  val singleRuleWithMerge: String =
    """rules:
      |  - jmespath: 'meta.topic'
      |    field: msg
      |    actions:
      |      - type: merge
      |        json:
      |          meta:
      |            hotdog:
      |              version: '{{version}}'
      |              timestamp: '{{iso8601}}'
      |""".stripMargin

  /** test/configs/single-rule-with-replace.yml */
  val singleRuleWithReplace: String =
    """rules:
      |  - regex: '^hello\s+(?P<name>\w+)?'
      |    field: msg
      |    actions:
      |      - type: replace
      |        template: |
      |          This is the total message: {{msg}}
      |
      |          And the name is: {{name}}
      |""".stripMargin

  /** test/configs/single-rule-with-hostname-field.yml */
  val singleRuleWithHostnameField: String =
    """rules:
      |  - regex: '^coconut$'
      |    field: hostname
      |    actions:
      |      - type: replace
      |        template: |
      |          This messages was received by my workstation
      |
      |          {{msg}}
      |
      |      - type: forward
      |        topic: test
      |
      |  - regex: '.*'
      |    field: hostname
      |    actions:
      |      - type: replace
      |        template: |
      |          This message NOT received properly
      |
      |          {{msg}}
      |
      |      - type: forward
      |        topic: test
      |""".stripMargin

  /** test/configs/single-rule-with-invalid-jmespath.yml — must FAIL to load */
  val singleRuleWithInvalidJmespath: String =
    """rules:
      |  - jmespath: '. 0 meta.topic'
      |    field: msg
      |    actions:
      |      - type: merge
      |        json:
      |          meta:
      |            hotdog:
      |              version: '{{version}}'
      |""".stripMargin

  /** examples/simple-plaintext/hotdog.yml */
  val simplePlaintext: String =
    """rules:
      |  - regex: '.*'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'logs-unknown'
      |      - type: stop
      |""".stripMargin

  /** Full-JMESPath showcase rules: filter-projection + pipe (first hot
    * item), slice + negative index (last extra tag), function + expression
    * reference (name of the max-price item), regex catch-all. Rule order
    * matters: each matcher is selective (null ⇒ fall through), mirroring
    * how a real hotdog config triages JSON telemetry
    * (matcher semantics: src/rules.rs:70-85; arbitrary jmespath-crate
    * expressions compile at src/connection.rs:297-311). */
  val jmesShowcaseYml: String =
    """rules:
      |  - jmespath: 'items[?p >= `20`].n | [0]'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'hot-{{value}}'
      |      - type: stop
      |
      |  - jmespath: 'tags[1:] | [-1]'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'tag-{{value}}'
      |      - type: stop
      |
      |  - jmespath: 'max_by(items, &p).n'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'pool-{{value}}'
      |      - type: stop
      |
      |  - regex: '.*'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'logs-unknown'
      |      - type: stop
      |""".stripMargin

  lazy val flagship: config.HotdogConfig = config.fromYamlString(hotdogYml)
  lazy val jmesShowcase: config.HotdogConfig = config.fromYamlString(jmesShowcaseYml)
}
